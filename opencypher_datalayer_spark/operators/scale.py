"""Scale techniques as reusable operators: salting for skewed join keys
and bucketed co-located joins.

AQE's skew-join splitting (on in ``session.get_spark``) handles most
skew at runtime; explicit salting remains the tool when one key is so
hot that even split partitions bottleneck (hub nodes in the graph,
stop-shingles in dedup), or when the skewed side feeds an aggregation
AQE can't split. Bucketing is the ahead-of-time answer for a join key
used repeatedly: both tables hash-clustered into the same bucket count
at write time, so every later join on that key is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the LEFT side's hot keys spread across
    ``n_salt`` shuffle partitions and the RIGHT side replicated
    ``n_salt``-fold. Result is identical to ``left.join(right, key,
    how)``; the shuffle key becomes (key, salt), so one hot key fans out
    to ``n_salt`` tasks instead of one straggler.

    Use when the left side is large and skewed and the right side is
    small enough to replicate (dimension-sized). Supported ``how``:
    inner and left outer — semantics where row multiplicity is
    unaffected by replication."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l = left.withColumn("__salt", salt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")


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
