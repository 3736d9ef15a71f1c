"""Scale techniques as reusable operators: bucketed co-located joins.

Skew verdict (measured, not asserted): replication salting is NOT part
of this engine's toolkit, deliberately. Every skewed JOIN in the
codebase is either a broadcast of the small side or is handled by AQE's
runtime skew-join split — ``tests/test_skew.py`` runs the real LSH
band-join shape on a synthetic hot bucket and asserts
``SortMergeJoin(skew=true)`` with split shuffle reads on both sides of
the executed adaptive plan. Salting-by-replication cannot help there
anyway (a self-join has no small side to replicate). Every hot-key
AGGREGATION in the codebase is algebraic (count/sum/min/max), which
Spark partially aggregates map-side before the exchange — a salted
two-phase groupBy would add a shuffle to do the job the partial
aggregate already does. A ``salted_join`` helper existed through round
3, unit-tested but with zero production call sites; it was removed
rather than kept as scale theater. Re-introduce only with a measured
straggler a broadcast/AQE/partial-agg cannot absorb (the candidate
profile: a holistic aggregate — collect_list/percentile — over a
power-law key).

Bucketing is the ahead-of-time answer for a join key used repeatedly:
both tables hash-clustered into the same bucket count at write time, so
every later join on that key is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_for_inflation(df: DataFrame, factor: int = 1) -> DataFrame:
    """Defensive re-split ahead of a work-INFLATING stage (shingle
    explode ~30x input bytes; per-vector scoring ~queries x dim flops
    per row).

    A parquet ROW GROUP is Spark's atomic split unit: a file written as
    one giant row group — exactly what pandas/pyarrow defaults produce,
    including this driver's own testdata files — scans as ONE task no
    matter how many byte-range splits the scheduler makes, serializing
    the whole downstream stage on a single core. Measured at the sf10
    rehearsal: one task held the entire 150M-shingle hash stage
    (330+ s of CPU) while 31 cores idled, because documents.parquet was
    500k rows in one row group. AQE cannot help (it only re-plans
    post-shuffle stages), and ``maxPartitionBytes`` cannot split inside
    a row group.

    The fix is a conditional round-robin repartition of the COMPACT
    pre-inflation rows — cheap relative to the inflated work. When the
    scan already yields at least the session's parallelism — any real
    multi-file table at cluster scale — this is a no-op costing one
    (cached) footer metadata lookup, so the shuffle is never paid where
    the layout is healthy.

    The split-count probe reads parquet footers directly instead of
    ``df.rdd.getNumPartitions()``: converting the frame to an RDD costs
    ~0.75 s of driver plan translation per call, which would tax every
    small query; footer reads are milliseconds and cached by file
    (path, mtime, size)."""
    import os

    if os.environ.get("SPARK_GRAFT_REBALANCE", "1") == "0":  # A/B kill switch
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df  # non-file source: splits are the upstream's business
    if _effective_splits(files, cores) < cores:
        # exactly `cores` output partitions measured best: more tasks
        # only add per-task/Arrow-batch overhead once every core is
        # busy (A/B at sf0.1: 32 parts beat 96 on every query)
        return df.repartition(cores * factor)
    return df


_SPLIT_CACHE: dict[tuple, int] = {}


def _effective_splits(files: list[str], cap: int) -> int:
    """Row groups summed over the scan's files (row groups are Spark's
    atomic split units, so this bounds achievable scan parallelism).
    Early-exits at ``cap``; non-local/unreadable files count 1 each."""
    import os

    total = 0
    for uri in files:
        if total >= cap:
            return total
        path = uri[7:] if uri.startswith("file:///") else uri
        path = "/" + path.lstrip("/") if not path.startswith("/") else path
        try:
            st = os.stat(path)
            key = (path, st.st_mtime_ns, st.st_size)
            n = _SPLIT_CACHE.get(key)
            if n is None:
                import pyarrow.parquet as pq

                n = pq.ParquetFile(path).metadata.num_row_groups
                _SPLIT_CACHE[key] = n
            total += n
        except OSError:
            total += 1
    return total


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` hash-bucketed by ``key``: subsequent joins between
    tables bucketed the same way on the same key run without a shuffle
    exchange (verified in tests/test_scale_ops.py)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )
