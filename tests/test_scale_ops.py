"""Scale-technique operators: result equivalence + the plan shapes that
make them worth using."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.scale import write_bucketed


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/bdemo'")
    try:
        a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bdemo.ta", "k", n_buckets=8)
        write_bucketed(b, "bdemo.tb", "k", n_buckets=8)

        # merge hint pins SortMergeJoin on both plans so the comparison
        # isolates the exchange (tiny test tables would broadcast)
        joined = spark.table("bdemo.ta").hint("merge").join(spark.table("bdemo.tb"), "k")
        plan = explain_str(joined)
        assert "Exchange" not in plan  # co-located buckets: shuffle-free
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000

        # the same join on unbucketed frames DOES shuffle — the contrast
        # that justifies the write-time bucketing cost
        plain = a.hint("merge").join(b, "k")
        assert "Exchange" in explain_str(plain)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")


def test_rebalance_for_inflation(spark, tmp_path):
    """A single-row-group parquet file scans as ONE task (row groups are
    atomic split units) — the defensive re-split must restore
    parallelism; an already-well-split frame must pass through as a
    no-op (no shuffle inserted)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation

    p = str(tmp_path / "one_rg.parquet")
    pq.write_table(pa.table({"x": list(range(10000))}), p)  # 1 row group
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    cores = spark.sparkContext.defaultParallelism
    fixed = rebalance_for_inflation(df, work_per_row=10_000)  # 100M units
    assert fixed.rdd.getNumPartitions() >= cores
    assert fixed.count() == 10000

    # same degenerate layout but a CHEAP downstream stage: the exchange
    # costs more than the single-core stage, so the gate skips it
    assert rebalance_for_inflation(df) is df
    assert rebalance_for_inflation(df, work_per_row=100) is df  # 1M < gate

    p2 = str(tmp_path / "many_rg.parquet")
    pq.write_table(
        pa.table({"x": list(range(10000))}), p2, row_group_size=10000 // (cores * 2)
    )
    healthy = spark.read.parquet(p2)
    assert rebalance_for_inflation(healthy) is healthy

    in_memory = spark.range(0, 1000, 1, 1)  # no input files -> no-op
    assert rebalance_for_inflation(in_memory) is in_memory


def test_rebalance_rows(spark):
    """The row-count form for frames the footer probe cannot see (a
    foreachBatch micro-batch): re-splits when rows x work clears the
    gate, no-op below it (r9: the streaming filter's single-file-batch
    trap — 73.3 s vs 7.0 s per sf10 epoch)."""
    from opencypher_datalayer_spark.operators.scale import rebalance_rows

    df = spark.range(0, 10_000, 1, 1)  # one partition, no input files
    cores = spark.sparkContext.defaultParallelism
    fixed = rebalance_rows(df, 10_000, work_per_row=10_000)  # 100M units
    assert fixed.rdd.getNumPartitions() >= cores
    assert fixed.count() == 10_000
    assert rebalance_rows(df, 10_000, work_per_row=100) is df  # 1M < gate
    assert rebalance_rows(df, 10, work_per_row=10_000) is df  # tiny batch


def test_rebalance_gate_matches_bench_intent(spark):
    """The work gate must keep the two decisions the bench depends on:
    the MinHash shingle stage at sf0.1 (5k docs x ~7k work units — a
    measured 3.3s -> 0.9s win) DOES re-split; the token-explode stages
    (chunking/TF-IDF, ~64 units/doc — a measured 0.4-0.8s TAX in round
    5) do NOT. Pins the gate against silent over- or under-tightening."""
    import os

    import pytest

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.1 testdata not present")
    from opencypher_datalayer_spark.benchqueries.dedup import WORK_MINHASH
    from opencypher_datalayer_spark.benchqueries.text import WORK_TOKENIZE
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation

    docs = spark.read.parquet(f"{sf01}/documents.parquet").select("doc_id", "text")
    assert rebalance_for_inflation(docs, work_per_row=WORK_MINHASH) is not docs
    assert rebalance_for_inflation(docs, work_per_row=WORK_TOKENIZE) is docs


def test_adaptive_lsh_planes():
    """Candidate-generation bucket width grows with corpus size: the
    oracle's 8 planes at every oracle/bench scale (so driver-checked
    results never change), more above ~16k vectors, capped at
    MAX_PLANES. The first N_PLANES of ALL_PLANES must BE the oracle
    planes — candidate buckets refine, never relabel."""
    from opencypher_datalayer_spark.benchqueries.similarity import (
        ALL_PLANES,
        HYPERPLANES,
        LSH_TARGET_OCCUPANCY,
        MAX_PLANES,
        N_PLANES,
        _lsh_n_planes,
    )

    assert ALL_PLANES[:N_PLANES] == HYPERPLANES
    # pool holds LSH_BANDS full-width slices (ADVICE r6 #2: slicing
    # band k at width up to MAX_PLANES must never truncate or go empty)
    from opencypher_datalayer_spark.benchqueries.similarity import (
        LSH_BANDS,
        _band_planes,
    )

    assert len(ALL_PLANES) == LSH_BANDS * MAX_PLANES
    seen = []
    for k in range(LSH_BANDS):
        band = _band_planes(k, MAX_PLANES)
        assert len(band) == MAX_PLANES
        seen.extend(map(tuple, (tuple(p) for p in band)))
    assert len(set(seen)) == len(seen)  # bands are disjoint plane sets
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        assert _lsh_n_planes(sf) == N_PLANES  # oracle scales: unchanged
    import math
    import os

    sf10 = "/root/repo/.scaledata/sf10"
    if os.path.isdir(sf10):
        from opencypher_datalayer_spark.benchqueries.similarity import _emb_rows

        n = _emb_rows(sf10)
        want = min(MAX_PLANES, max(N_PLANES, math.ceil(math.log2(n / LSH_TARGET_OCCUPANCY))))
        assert _lsh_n_planes(sf10) == want > N_PLANES
