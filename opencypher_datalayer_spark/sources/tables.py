"""Parquet table loading for the driver-provided star schema.

Loading stays declarative (``spark.read.parquet``) so Catalyst can push
filters and prune columns down to the parquet row-group level — verify
with ``.explain("formatted")`` (look for PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # harness-independence: a caller-provided session (the driver's) may
    # not carry our session.py conf; timestamp semantics must be UTC for
    # oracle comparability regardless (runtime-settable, idempotent)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across driver data generations; normalize
        # either to session-TZ TimestampType. NANOS is rejected by the
        # vectorized reader, so it is read as raw int64 nanos
        # (nanosAsLong) and floored to micros with integer div (never
        # float: epoch-ns ~1.7e18 exceeds double's 2^53 mantissa) —
        # exactly DuckDB's TIMESTAMP_NS fetch. MICROS arrives as
        # TIMESTAMP_NTZ; the cast reinterprets the wall-clock in the
        # UTC session zone, matching DuckDB's naive TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if df.schema["ts"].dataType.simpleString() == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
