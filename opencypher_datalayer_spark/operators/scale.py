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
