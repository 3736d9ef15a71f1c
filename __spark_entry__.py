"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship graph pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the primary operator registry
(``opencypher_datalayer_spark.benchqueries``): 50 queries — one per
operator family, interleaved across families — spanning
relational/TPC-H shapes, the graph read+write Cypher surface
(including variable-length paths, WITH stages, UNWIND, and the write
templates end-to-end), graph analytics (triangles, fixed-point
PageRank), dedup (exact/Jaccard/MinHash-LSH/SimHash/embedding/exact-substring +
connected-components clustering, incremental and streaming ingest-time
variants), similarity (brute-force/LSH/IVF),
text analysis, temporal/streaming twins (windows, sessionization,
as-of and interval joins), JSON extraction, and multimodal binary
plumbing. A further 74 shape-twin queries (same operator family as a
primary entry — see ``benchqueries.EXTENDED``) stay oracle-checked
locally via ``scripts/selfcheck.py``. Every query — all 50 primaries
and all 67 twins, including the pandas-UDF multimodal pipelines and
the iterative graph algorithms — carries a full DuckDB value oracle
with identical column names and driver-canonical output types (no raw
DECIMAL/HUGEINT/array in final projections).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the property graph from the star schema and
    run the reference's canonical readback shape (label scan + optional
    expand + collect) — R1+R2+R3 of SURVEY §2-R."""
    from opencypher_datalayer_spark.benchqueries.graph import g_expand_collect

    return g_expand_collect(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opencypher_datalayer_spark.benchqueries import all_queries

    return {name: qd.fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from opencypher_datalayer_spark.benchqueries import all_queries

    return {
        name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None
    }
