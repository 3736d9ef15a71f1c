"""Cache-invalidation and size-adaptive-broadcast behavior of the dedup
family (VERDICT r3 'what's wrong' #2/#4): the memoized MinHash signature
frame must refresh when the parquet under sf_dir is regenerated in the
same session, and the Jaccard/containment verify joins must drop their
broadcast hint when the estimated sets-frame size exceeds the gate."""

import os
import shutil

import pandas as pd
import pytest

from opencypher_datalayer_spark.benchqueries import dedup
from tests.test_plan_audit import explain_str

SRC = "/root/testdata/sf0.001"


def _write_docs(sf_dir: str, texts: dict[int, str]) -> None:
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": ["t"] * len(texts),
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(os.path.join(sf_dir, "documents.parquet"))


def test_signature_cache_invalidates_on_data_change(spark, tmp_path):
    sf = str(tmp_path)
    _write_docs(sf, {1: "the quick brown fox jumps over the lazy dog" * 3})
    first = dedup._minhash_sigs(spark, sf).collect()
    # regenerate the parquet in place (same path — what the test driver
    # does between rounds) and expect FRESH signatures, not the memo
    _write_docs(sf, {1: "a completely different document body entirely" * 3})
    second = dedup._minhash_sigs(spark, sf).collect()
    assert first != second
    # unchanged data hits the cache (same object back)
    assert dedup._minhash_sigs(spark, sf) is dedup._minhash_sigs(spark, sf)


def test_clear_signature_cache_forces_recompute(spark, tmp_path):
    sf = str(tmp_path)
    _write_docs(sf, {1: "some document text for the cache clear check" * 2})
    a = dedup._minhash_sigs(spark, sf)
    dedup.clear_signature_cache()
    assert dedup._minhash_sigs(spark, sf) is not a


@pytest.fixture()
def no_auto_broadcast(spark):
    """Disable Catalyst's stats-based auto-broadcast so the tests observe
    the presence/absence of the explicit hint, not table-size luck."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_verify_join_broadcasts_under_gate(spark, no_auto_broadcast):
    """Under the gate the hint forces a broadcast even when stats-based
    auto-broadcast is off."""
    plan = explain_str(dedup.dedup_ngram_jaccard(spark, SRC))
    assert "BroadcastHashJoin" in plan


def test_verify_join_shuffles_over_gate(spark, no_auto_broadcast, monkeypatch):
    """Forcing the gate to zero must withhold the broadcast hint: the
    verify join degrades to a shuffle join instead of blowing memory —
    with identical rows."""
    expected = dedup.dedup_ngram_jaccard(spark, SRC).collect()
    monkeypatch.setattr(dedup, "BROADCAST_SETS_MAX_BYTES", 0)
    df = dedup.dedup_ngram_jaccard(spark, SRC)
    plan = explain_str(df)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert df.collect() == expected


def test_containment_gate_applies(spark, no_auto_broadcast, monkeypatch):
    monkeypatch.setattr(dedup, "BROADCAST_SETS_MAX_BYTES", 0)
    plan = explain_str(dedup.dedup_ngram_containment(spark, SRC))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_verify_sets_side_reads_bucketed_without_exchange(
    spark, no_auto_broadcast, monkeypatch
):
    """Above the broadcast gate the per-doc sets frame is persisted
    BUCKETED by doc_id (VERDICT r6 #3), so the two shuffle verify joins
    consume the scan's hash-partitioning directly: the plan must show a
    bucketed scan and no Exchange between that scan and the join —
    only the candidate side exchanges."""
    monkeypatch.setattr(dedup, "BROADCAST_SETS_MAX_BYTES", 0)
    df = dedup.dedup_ngram_jaccard(spark, SRC)
    plan = explain_str(df)
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    # structural pin: shuffle-verify joins present, sets scans bucketed
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") >= 2
    # executed-rows check: bucketed path returns identical rows
    monkeypatch.undo()
    expected = dedup.dedup_ngram_jaccard(spark, SRC).collect()
    monkeypatch.setattr(dedup, "BROADCAST_SETS_MAX_BYTES", 0)
    assert dedup.dedup_ngram_jaccard(spark, SRC).collect() == expected


def test_sweep_stale_sets_tables(spark):
    """ADVICE r7 #3: the warehouse sweep reclaims provably-dead
    ngram_sets_* locations (legacy pre-pid names, dirs whose owner pid
    is gone, this process's superseded fingerprints) and never touches
    a dir owned by another LIVE process."""
    import subprocess

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    root = warehouse.removeprefix("file:")
    os.makedirs(root, exist_ok=True)
    dead = subprocess.Popen(["true"])
    dead.wait()
    mine_stale = f"ngram_sets_md5_{'a' * 10}_p{os.getpid()}"
    dirs = {
        "legacy": f"ngram_sets_md5_{'b' * 10}",
        "deadpid": f"ngram_sets_md5_{'c' * 10}_p{dead.pid}",
        "livepid": f"ngram_sets_md5_{'d' * 10}_p1",
        "mine": mine_stale,
        "unrelated": "some_other_table",
    }
    for d in dirs.values():
        os.makedirs(os.path.join(root, d), exist_ok=True)
    try:
        dedup._sweep_stale_sets_tables(spark, keep="nothing")
        assert not os.path.isdir(os.path.join(root, dirs["legacy"]))
        assert not os.path.isdir(os.path.join(root, dirs["deadpid"]))
        assert not os.path.isdir(os.path.join(root, dirs["mine"]))
        assert os.path.isdir(os.path.join(root, dirs["livepid"]))
        assert os.path.isdir(os.path.join(root, dirs["unrelated"]))
    finally:
        for d in dirs.values():
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


SF001 = "/root/testdata/sf0.01"


def test_hash_family_equivalence(spark):
    """The xxhash64 engine default and the md5 oracle mode agree on the
    VERIFIED near-dup output at sf0.01: the exact-overlap verify step
    makes the Jaccard pairs a function of the shingle *sets*, not the
    hash values (VERDICT r4 'next round' #1)."""
    md5_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, SF001, hash_family="md5").collect()
    }
    xx_pairs = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, SF001, hash_family="xxhash64").collect()
    }
    assert md5_pairs == xx_pairs and md5_pairs
    # SimHash pairs: the fingerprint is hash-dependent, but both modes
    # produce a valid fingerprint frame with one row per doc
    n_md5 = dedup.dedup_simhash(spark, SF001, hash_family="md5").count()
    n_xx = dedup.dedup_simhash(spark, SF001, hash_family="xxhash64").count()
    assert n_md5 == n_xx


def test_hash_family_validation_and_cache_isolation(spark, tmp_path):
    sf = str(tmp_path)
    _write_docs(sf, {1: "cache isolation across hash families check" * 3, 2: "b" * 40})
    with pytest.raises(ValueError):
        dedup._minhash_sigs(spark, sf, hash_family="sha1")
    a = dedup._minhash_sigs(spark, sf, hash_family="md5")
    b = dedup._minhash_sigs(spark, sf, hash_family="xxhash64")
    # distinct cache entries, distinct signatures
    assert a is not b
    assert a.collect() != b.collect()
    # each family memoizes independently
    assert dedup._minhash_sigs(spark, sf, hash_family="xxhash64") is b
