"""Recall drift over frozen-codebook IVF extension chains (VERDICT r9
next #4): extend the standing index in waves WITHOUT retraining (FAISS
add() semantics — ``operators.vector_index.extend_ivf_index``), measure
recall@5 of the pruned probe against an exact driver-side oracle after
every wave, and measure what a compact (retrain on the grown corpus)
restores at the end. The committed ``needs_compact()`` rule in
``operators/vector_index.py`` is derived from this curve; SCALE.md
§recall-drift records the numbers.

Usage::

    python scripts/recall_drift_rehearsal.py [sf_dir] [n_waves]

Default sf_dir .scaledata/sf10 (200k vectors, d=32): base = 20% of the
corpus (ids % 10 < 2), each wave extends by another 10%-of-total slice
(ids % 10 == w) — growth factors 1.5x .. 5.0x over 8 waves.

Exact oracle: numpy cosine over the full current corpus with the
engine's emit arithmetic (float64 of the float32 embeddings, cosine
rounded half-up to 6 places, self excluded, ties by c_id asc) — at
200k x 32 the whole corpus is a 25 MB driver matrix, so brute force is
trivially exact here while the engine path under test stays fully
distributed.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opencypher_datalayer_spark.session import get_spark  # noqa: E402
from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec  # noqa: E402
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore  # noqa: E402
from opencypher_datalayer_spark.operators.ivf_codebook import (  # noqa: E402
    ASSIGN_A,
    ivf_nprobe,
    k_cells_for,
)
from opencypher_datalayer_spark.operators.vector_index import (  # noqa: E402
    build_ivf_index,
    compact_ivf_index,
    extend_ivf_index,
    ivf_pruned_topk,
    needs_compact,
)

TOPK = 5
N_Q = 100


def round_half_up6(x: np.ndarray) -> np.ndarray:
    # Spark ROUND(x, 6) is HALF-UP on the magnitude; numpy .round is
    # banker's — replicate the engine's rule sign-aware
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def exact_top5(V: np.ndarray, nrm: np.ndarray, ids: np.ndarray, q_idx: np.ndarray) -> dict[int, list[int]]:
    """Engine-emit-aligned exact top-5 per query over the CURRENT corpus:
    cosine rounded to 6, self excluded, order (cos desc, c_id asc)."""
    out: dict[int, list[int]] = {}
    Q = V[q_idx]
    qn = nrm[q_idx]
    cos = round_half_up6((Q @ V.T) / np.outer(qn, nrm))
    for row, qi in enumerate(q_idx):
        qid = int(ids[qi])
        order = sorted(
            ((-cos[row, j], int(ids[j])) for j in range(len(ids)) if int(ids[j]) != qid)
        )
        out[qid] = [c for _, c in order[:TOPK]]
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf10"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="recall_drift")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )

    pdf = emb.toPandas()
    all_ids = pdf["vec_id"].to_numpy()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((V * V).sum(axis=1))

    base_mask = all_ids % 10 < 2
    base_ids = all_ids[base_mask]
    q_ids = set(int(i) for i in np.sort(base_ids)[:N_Q])
    n_base = int(base_mask.sum())

    root = tempfile.mkdtemp(prefix="recall_drift_")
    store = ArtifactStore(root)
    kind, key = "ivf", ("drift",)
    base_df = emb.where(F.col("vec_id") % 10 < 2)

    def build(tmp: str) -> None:
        build_ivf_index(spark, base_df, tmp)
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump({"n_corpus": n_base, "n_trained": n_base}, f)

    t0 = time.perf_counter()
    store.get_or_build(kind, key, build)
    build_s = time.perf_counter() - t0

    queries = emb.where(F.col("vec_id").isin(sorted(q_ids))).select(
        F.col("vec_id").alias("q_id"), _vec().alias("qv"), _norm(_vec()).alias("qn")
    ).localCheckpoint()

    def probe_recall(adir, corpus_mask) -> dict:
        n_now = int(corpus_mask.sum())
        npb = ivf_nprobe(n_now)
        t0 = time.perf_counter()
        got = ivf_pruned_topk(spark, adir, queries, topk=TOPK, nprobe=npb).collect()
        probe_s = time.perf_counter() - t0
        by_q: dict[int, list[int]] = {}
        for r in got:
            by_q.setdefault(int(r.q_id), []).append(int(r.c_id))
        sub = np.flatnonzero(corpus_mask)
        ids_now, V_now, nrm_now = all_ids[sub], V[sub], nrm[sub]
        q_idx = np.flatnonzero(np.isin(ids_now, list(q_ids)))
        exact = exact_top5(V_now, nrm_now, ids_now, q_idx)
        recalls = [
            len(set(by_q.get(q, [])) & set(top)) / TOPK for q, top in exact.items()
        ]
        return {
            "n_corpus": n_now,
            "nprobe": npb,
            "recall_mean": round(float(np.mean(recalls)), 4),
            "recall_min": round(float(np.min(recalls)), 4),
            "probe_s": round(probe_s, 2),
        }

    waves = []
    cur = store.current_dir(kind, key)
    r0 = probe_recall(cur, base_mask)
    r0.update({"wave": 0, "growth": 1.0, **needs_compact(spark, cur)})
    print(json.dumps(r0))
    waves.append(r0)

    corpus_mask = base_mask.copy()
    for w in range(1, n_waves + 1):
        mod = 1 + w  # ids % 10 == 2, 3, ... 9
        delta_df = emb.where(F.col("vec_id") % 10 == mod)
        t0 = time.perf_counter()
        cur = extend_ivf_index(spark, store, kind, key, delta_df)
        extend_s = time.perf_counter() - t0
        corpus_mask |= all_ids % 10 == mod
        rec = probe_recall(cur, corpus_mask)
        rec.update(
            {
                "wave": w,
                "growth": round(rec["n_corpus"] / n_base, 3),
                "extend_s": round(extend_s, 2),
                **needs_compact(spark, cur),
            }
        )
        print(json.dumps(rec))
        waves.append(rec)

    # what compact restores at the end of the chain
    t0 = time.perf_counter()
    cur = compact_ivf_index(spark, store, kind, key)
    compact_s = time.perf_counter() - t0
    rec = probe_recall(cur, corpus_mask)
    rec.update({"wave": "compact", "compact_s": round(compact_s, 2), **needs_compact(spark, cur)})
    print(json.dumps(rec))
    waves.append(rec)

    summary = {
        "sf_dir": sf_dir,
        "n_base": n_base,
        "k_trained": k_cells_for(n_base),
        "assign_a": ASSIGN_A,
        "build_s": round(build_s, 2),
        "waves": waves,
    }
    out = os.environ.get("DRIFT_OUT", "/tmp/recall_drift.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("WROTE", out)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
