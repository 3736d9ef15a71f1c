"""opencypher_datalayer_spark — a PySpark-native property-graph analytics engine.

A brand-new engine with the query and data-processing capabilities of the
UDA-compliant openCypher data layer it mirrors (reference:
mimiro-io/opencypher-datalayer), re-expressed Spark-first:

- the EGDM entity ingest/merge/delete semantics as DataFrame operations
  over two columnar tables (``nodes``, ``edges``);
- the openCypher read surface (MATCH / OPTIONAL MATCH / WHERE / RETURN /
  COLLECT) implemented natively as Catalyst plans;
- the UDA service surface (datasets, full-sync / incremental writers,
  change feeds) without a graph-database dependency;
- large-scale data-pipeline extensions: relational OLAP, dedup,
  similarity search, text analysis, streaming.

Everything is declared through the DataFrame/SQL API so Catalyst/Tungsten
choose the physical strategy; Python UDFs appear only where built-in
operators cannot express the semantics (and then as Arrow-batched
pandas UDFs).
"""

from opencypher_datalayer_spark.session import get_spark
from opencypher_datalayer_spark.store import GraphStore
from opencypher_datalayer_spark.ingest import DataLayer

__all__ = ["get_spark", "GraphStore", "DataLayer"]
__version__ = "0.1.0"
