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


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => not SQL-expressible; driver does rows-only check
    description: str = ""


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
            registry[name] = qd
    return registry
