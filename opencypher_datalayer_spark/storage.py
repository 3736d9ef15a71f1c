"""Durable storage for the graph: versioned parquet snapshots with an
atomic CURRENT pointer — a minimal table format.

The reference got atomicity from Neo4j's per-batch transaction
(``neo4j.go:238-284``) and full-sync wipes were *not* atomic across the
sync (readers between wipe and load saw an empty dataset — SURVEY §3.3).
Here every commit is a new immutable version directory plus an atomic
rename of the pointer file, so readers always see a complete snapshot
and a full sync becomes an atomic swap — same semantics, visibility gap
fixed.

On a cluster this role is played by Delta/Iceberg (not on this image);
the interface is kept small so a Delta-backed implementation can drop in.

Layout::

    root/
      v00000001/nodes/*.parquet
      v00000001/edges/*.parquet
      v00000002/...
      CURRENT            # text: version number of the live snapshot

Writes are partitioned by ``label`` (nodes) / ``rel_type`` (edges) so
label scans and per-type edge reads partition-prune (the analog of the
reference's per-label gid index, ``neo4j.go:21``).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

from opencypher_datalayer_spark.model import EDGES_SCHEMA, NODES_SCHEMA
from opencypher_datalayer_spark.store import GraphStore

_CURRENT = "CURRENT"


class ParquetGraphStorage:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- versions ------------------------------------------------------

    def current_version(self) -> int:
        path = os.path.join(self.root, _CURRENT)
        if not os.path.exists(path):
            return 0
        with open(path) as f:
            return int(f.read().strip())

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:08d}")

    # -- IO ------------------------------------------------------------

    def load(self, spark: SparkSession) -> GraphStore:
        return self.load_version(spark, self.current_version())

    def load_version(self, spark: SparkSession, v: int) -> GraphStore:
        """Load a specific retained snapshot version (time travel — the
        basis of the change feed's version diff)."""
        if v == 0:
            return GraphStore.empty(spark)
        vdir = self._version_dir(v)
        if not os.path.isdir(vdir):
            raise ValueError(f"version {v} not found (vacuumed?)")
        # explicit schemas: an empty snapshot has no data files to infer
        # from, and partition columns must come back string-typed and in
        # declared column order.
        nodes = (
            spark.read.schema(NODES_SCHEMA)
            .parquet(os.path.join(vdir, "nodes"))
            .select("gid", "label", "source", "props")
        )
        edges = (
            spark.read.schema(EDGES_SCHEMA)
            .parquet(os.path.join(vdir, "edges"))
            .select("src", "rel_type", "dst", "source")
        )
        return GraphStore(nodes, edges)

    def commit(self, store: GraphStore) -> int:
        """Write a new snapshot version and atomically repoint CURRENT."""
        v = self.current_version() + 1
        vdir = self._version_dir(v)
        store.nodes.write.mode("overwrite").partitionBy("label").parquet(
            os.path.join(vdir, "nodes")
        )
        store.edges.write.mode("overwrite").partitionBy("rel_type").parquet(
            os.path.join(vdir, "edges")
        )
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.root, _CURRENT))  # atomic pointer swap
        return v

    def vacuum(self, keep: int = 2) -> None:
        """Drop version directories older than the newest ``keep``."""
        current = self.current_version()
        for name in sorted(os.listdir(self.root)):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if v <= current - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
