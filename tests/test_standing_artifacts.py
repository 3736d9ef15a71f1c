"""Standing corpus artifacts for the dedup family (r9): warm probes
reuse the committed corpus frames across memo clears, results are
identical warm and cold, and a corpus change invalidates by key."""

import os

from opencypher_datalayer_spark.benchqueries import dedup
from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
from opencypher_datalayer_spark.operators.artifacts import default_store


def test_incremental_artifact_survives_clear_and_matches(spark, sf_dir):
    store = default_store()
    store.drop(kind=dedup._INCR_ARTIFACT_KIND)
    clear_memo_caches()
    cold = [tuple(r) for r in dedup.dedup_incremental(spark, sf_dir).collect()]
    adir = store.current_dir(
        dedup._INCR_ARTIFACT_KIND,
        dedup._incr_artifact_key(sf_dir, dedup.DEFAULT_HASH_FAMILY),
    )
    assert adir is not None  # the run committed the standing corpus
    for sub in ("shingles", "freq", "sets", "slim"):
        assert os.path.isdir(os.path.join(adir, sub))

    clear_memo_caches()
    assert (
        dedup.build_incremental_artifacts(spark, sf_dir) == adir
    )  # warm: no rebuild
    warm = [tuple(r) for r in dedup.dedup_incremental(spark, sf_dir).collect()]
    assert warm == cold and cold  # same answers, non-degenerate


def test_minhash_sigs_artifact_round_trip(spark, sf_dir):
    """The signature table read back from the standing artifact is
    row-identical to a fresh computation (int64 mins + band strings
    round-trip exactly through parquet)."""
    from opencypher_datalayer_spark.operators import minhash as mh
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation
    from opencypher_datalayer_spark.sources.tables import load_table

    store = default_store()
    store.drop(kind="minhash_sigs")
    clear_memo_caches()
    via_artifact = sorted(
        tuple(r)
        for r in dedup._minhash_sigs(spark, sf_dir, "md5").collect()
    )
    direct = sorted(
        tuple(r)
        for r in mh.signatures_for(
            rebalance_for_inflation(
                load_table(spark, "documents", sf_dir).select("doc_id", "text"),
                work_per_row=dedup.WORK_MINHASH,
            ),
            "md5",
        ).collect()
    )
    assert via_artifact == direct and direct


def test_artifact_key_includes_corpus_fingerprint(tmp_path, spark):
    """Two different corpora under different paths never share an
    artifact (the key embeds the documents-parquet file fingerprint)."""
    import pandas as pd

    for sub, texts in (("a", ["alpha beta"] * 3), ("b", ["gamma delta"] * 3)):
        d = tmp_path / sub
        d.mkdir()
        pd.DataFrame(
            {"doc_id": range(3), "text": texts, "lang": "en", "source": "t",
             "n_chars": [len(t) for t in texts]}
        ).to_parquet(str(d / "documents.parquet"))
    ka = dedup._incr_artifact_key(str(tmp_path / "a"), "md5")
    kb = dedup._incr_artifact_key(str(tmp_path / "b"), "md5")
    assert ka != kb
    store = default_store()
    da = store._adir(dedup._INCR_ARTIFACT_KIND, ka)
    db = store._adir(dedup._INCR_ARTIFACT_KIND, kb)
    assert da != db
