"""Hypothesis model of the artifact-store lifecycle: random
commit / extend / raced-extend / sweep sequences must always leave
CURRENT pointing at a COMPLETE version whose content equals the model —
in particular, no interleaving of extensions may ever lose a delta
(the CAS contract), on either backend."""

import json
import os
import shutil
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from opencypher_datalayer_spark.operators.artifacts import open_artifact_store

KIND, KEY = "model", (("k",),)


def _write_token(d: str, token: str) -> None:
    with open(os.path.join(d, f"{token}.json"), "w") as f:
        json.dump({"t": token}, f)


def _content(vdir: str) -> set[str]:
    return {n[:-5] for n in os.listdir(vdir) if n.endswith(".json")}


ops_strategy = st.lists(
    st.sampled_from(["commit", "extend", "extend_race", "sweep"]),
    min_size=1,
    max_size=10,
)


@settings(max_examples=25, deadline=None)
@given(backend=st.sampled_from(["localfs", "txnlog"]), ops=ops_strategy)
def test_lifecycle_model_never_loses_a_delta(backend, ops):
    root = tempfile.mkdtemp(prefix="artifact_model_")
    try:
        store = open_artifact_store(root, backend)
        model: set[str] = set()
        counter = [0]

        def fresh() -> str:
            counter[0] += 1
            return f"t{counter[0]:03d}"

        for op in ops:
            if op == "commit" or (
                op in ("extend", "extend_race")
                and store.current_dir(KIND, KEY) is None
            ):
                tok = fresh()
                store.commit(KIND, KEY, lambda d, tok=tok: _write_token(d, tok))
                model = {tok}  # full rebuild replaces content
            elif op == "extend":
                tok = fresh()
                store.commit_extension(
                    KIND, KEY, lambda d, tok=tok: _write_token(d, tok)
                )
                model.add(tok)
            elif op == "extend_race":
                # a competing extender completes BETWEEN this one's
                # base read and publish (triggered from inside the
                # builder) — the CAS must keep BOTH deltas
                tok_a, tok_b = fresh(), fresh()
                fired = []

                def build_a(d, tok_a=tok_a, tok_b=tok_b, fired=fired):
                    if not fired:
                        fired.append(1)
                        store.commit_extension(
                            KIND, KEY, lambda d2: _write_token(d2, tok_b)
                        )
                    _write_token(d, tok_a)

                store.commit_extension(KIND, KEY, build_a)
                model |= {tok_a, tok_b}
            elif op == "sweep":
                store.sweep(keep_versions=1)
            cur = store.current_dir(KIND, KEY)
            if model:
                assert cur is not None
                assert _content(cur) == model, (backend, op, ops)
    finally:
        shutil.rmtree(root, ignore_errors=True)
