"""Query registry: every operator the engine claims, as a named query
with (when SQL-expressible) a DuckDB oracle.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an ANSI-SQL string the driver runs on DuckDB over the same parquet
tables. Column names are aliased identically on both sides; float
accumulation is routed through exact decimal arithmetic so value hashes
match bit-for-bit (doubles only appear where IEEE semantics are
order-independent: per-row ops, min/max, and division of exact values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; driver does rows-only check
    description: str = ""


def driver_safe_output(df: DataFrame) -> DataFrame:
    """Cast DECIMAL output columns to double for the driver's canonicalizer.

    The driver compares results through pandas, where DuckDB ``.df()``
    degrades DECIMAL to float64 while Spark ``toPandas()`` keeps exact
    ``Decimal`` objects — identical values hash differently. Queries keep
    exact decimal arithmetic *internally* (order-independent accumulation);
    only the final projection converts, one IEEE rounding of an exact value
    on both sides (each oracle mirrors it with ``CAST(... AS DOUBLE)``).
    Applied after any ORDER BY/LIMIT, so top-k selection still ties-breaks
    on the exact decimal.
    """
    dec_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, T.DecimalType)}
    if not dec_cols:
        return df
    return df.select(
        *[F.col(c).cast("double").alias(c) if c in dec_cols else F.col(c) for c in df.columns]
    )


def _driver_safe(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return driver_safe_output(fn(spark, sf_dir))

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def all_queries() -> dict[str, QueryDef]:
    from opencypher_datalayer_spark.benchqueries import (
        dedup,
        graph,
        graphalgo,
        multimodal,
        relational,
        relational2,
        similarity,
        temporal,
        text,
    )

    registry: dict[str, QueryDef] = {}
    for mod in (
        relational,
        relational2,
        graph,
        graphalgo,
        dedup,
        text,
        similarity,
        temporal,
        multimodal,
    ):
        for name, qd in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name {name!r}")
            registry[name] = QueryDef(_driver_safe(qd.fn), qd.oracle, qd.description)
    return registry
