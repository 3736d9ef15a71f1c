"""UDA service surface: datasets, full-sync / incremental writers, config.

Mirrors the reference's service layer (``layer.go``) without the HTTP
transport: named datasets with per-dataset ``label`` and ``batch_size``
(``layer.go:145-163``), a buffering writer that flushes every
``batch_size`` entities (W1, ``layer.go:227-238``) and on close (W2),
full-sync wipe on the start batch (W10, ``layer.go:196-209``), and pure
upsert for incremental (W11).

Read-side methods the reference declares but answers with
``LayerNotSupported`` (``layer.go:257-265``) are implemented natively
here: ``changes`` (S8) and ``entities`` (S9) — this engine owns its
storage, so reading back is a scan, not a federation problem.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.functions.localframe import local_df
from opencypher_datalayer_spark.model import ENTITY_SCHEMA, normalize_entity
from opencypher_datalayer_spark.storage import open_storage
from opencypher_datalayer_spark.store import GraphStore


class LayerConfigError(ValueError):
    """Typed bad-parameter config error — the analog of the reference's
    ``cdl.Err(..., cdl.LayerErrorBadParameter)`` returns from
    ``UpdateConfiguration`` (``layer.go:80-102``)."""


@dataclass(frozen=True)
class BatchInfo:
    """Full-sync batch metadata (reference ``layer.go:196-209``)."""

    sync_id: str = ""
    is_start_batch: bool = False
    is_last_batch: bool = False


@dataclass
class DatasetConfig:
    name: str
    label: str
    batch_size: int = 1000


class DatasetWriter:
    """Buffers entities and applies them in micro-batches (W1/W2).

    One flush == one ``GraphStore.apply_batch`` == the reference's
    per-batch transaction.
    """

    def __init__(self, layer: "DataLayer", dataset: DatasetConfig):
        self._layer = layer
        self._ds = dataset
        self._buffer: list[dict] = []
        self._seq = 0

    def write(self, entity: dict) -> None:
        row = normalize_entity(entity)
        row["_seq"] = self._seq
        self._seq += 1
        self._buffer.append(row)
        if len(self._buffer) >= self._ds.batch_size:
            self._flush()

    def close(self) -> None:
        if self._buffer:
            self._flush()

    def _flush(self) -> None:
        batch = local_df(self._layer.spark, self._buffer, ENTITY_SCHEMA)
        self._buffer = []
        self._layer._apply(batch, self._ds)


class Dataset:
    """UDA dataset facade over the shared graph store (S3/S5-S7)."""

    def __init__(self, layer: "DataLayer", config: DatasetConfig):
        self._layer = layer
        self.config = config

    @property
    def name(self) -> str:
        return self.config.name

    def full_sync(self, batch_info: BatchInfo) -> DatasetWriter:
        """Wipe (label, source) on the start batch, then write (W10).

        Unlike the reference, wipe+load commits atomically per flush —
        readers never observe the emptied intermediate state.
        """
        if batch_info.is_start_batch:
            self._layer._wipe(self.config)
        return DatasetWriter(self._layer, self.config)

    def incremental(self) -> DatasetWriter:
        """Pure upsert stream, no wipe (W11)."""
        return DatasetWriter(self._layer, self.config)


class DataLayer:
    """Engine session + dataset registry (S1-S4).

    ``storage_root=None`` keeps the graph in-memory (checkpointed
    DataFrames) for tests; a path makes every flush a durable atomic
    commit.
    """

    def __init__(
        self,
        spark: SparkSession,
        config: dict | None = None,
        storage_root: str | None = None,
        storage_backend: str = "parquet",
    ):
        self.spark = spark
        self.datasets: dict[str, DatasetConfig] = {}
        self._storage = (
            open_storage(storage_root, storage_backend) if storage_root else None
        )
        self._store = (
            self._storage.load(spark) if self._storage else GraphStore.empty(spark)
        )
        self._config_path: str | None = None
        self._config_mtime: float = 0.0
        if config:
            self.update_configuration(config)

    # -- config (S2) ---------------------------------------------------

    @classmethod
    def from_config_path(cls, spark: SparkSession, path: str, **kw) -> "DataLayer":
        with open(path) as f:
            layer = cls(spark, json.load(f), **kw)
        layer._config_path = path
        layer._config_mtime = os.path.getmtime(path)
        return layer

    def maybe_reload_config(self) -> bool:
        """Hot reload (S2): re-read the config file if it changed on
        disk (the framework around the reference polls on a
        ``config_refresh_interval`` timer — callers do the same and
        invoke this). Returns True if the registry was refreshed."""
        if not self._config_path:
            return False
        mtime = os.path.getmtime(self._config_path)
        if mtime == self._config_mtime:
            return False
        with open(self._config_path) as f:
            self.update_configuration(json.load(f))
        self._config_mtime = mtime
        return True

    def update_configuration(self, config: dict) -> None:
        """Load/refresh the dataset registry from a UDA-shaped config
        (same JSON shape as the reference's ``testconfig/config.json``).

        Validation mirrors ``layer.go:80-102``: when the config carries a
        ``native_system_config`` section, each of ``system_type`` /
        ``endpoint`` / ``username`` / ``password`` must be present —
        missing keys raise :class:`LayerConfigError` with the reference's
        message, and the previous registry stays in effect. A config
        without the section is the library-embedded mode (this engine IS
        the native system) and needs no connection details."""
        if not isinstance(config, dict):
            raise LayerConfigError("config must be a JSON object")
        nsc = config.get("native_system_config")
        if nsc is not None:
            if not isinstance(nsc, dict):
                raise LayerConfigError("native_system_config must be an object")
            for key in ("system_type", "endpoint", "username", "password"):
                if nsc.get(key) is None:
                    raise LayerConfigError(
                        f"no {key.replace('_', ' ')} specified in native system config"
                    )
        defs = config.get("dataset_definitions", [])
        registry: dict[str, DatasetConfig] = {}
        for d in defs:
            if not isinstance(d, dict) or "name" not in d:
                raise LayerConfigError("dataset definition missing 'name'")
            sc = d.get("source_config", {})
            registry[d["name"]] = DatasetConfig(
                name=d["name"],
                label=sc.get("label", d["name"]),
                batch_size=int(sc.get("batch_size", 1000)),
            )
        self.datasets = registry

    # -- registry (S3/S4) ----------------------------------------------

    def dataset(self, name: str) -> Dataset:
        if name not in self.datasets:
            raise KeyError(f"dataset {name!r} not found")
        return Dataset(self, self.datasets[name])

    def dataset_descriptions(self) -> list[dict]:
        return [{"name": d.name, "label": d.label} for d in self.datasets.values()]

    # -- store access --------------------------------------------------

    @property
    def store(self) -> GraphStore:
        return self._store

    def _apply(self, batch: DataFrame, ds: DatasetConfig) -> None:
        if self._storage is not None:
            # pruned MERGE: rewrite only the files whose gid range the
            # batch touches; untouched files carry forward as links
            self._storage.merge_commit(self.spark, batch, ds.label, ds.name)
            self._store = self._storage.load(self.spark)
        else:
            self._store = self._store.apply_batch(batch, ds.label, ds.name).checkpointed()

    def _wipe(self, ds: DatasetConfig) -> None:
        self._commit(self._store.delete_all(ds.label, ds.name))

    def _commit(self, new: GraphStore) -> None:
        if self._storage is not None:
            self._storage.commit(new)
            self._store = self._storage.load(self.spark)
        else:
            self._store = new.checkpointed()

    # -- ad-hoc query (S10 — the reference's stub, neo4j.go:289-291) ----

    def query(self, statement: str, params: dict | None = None):
        """Run an openCypher statement against the store. Read queries
        return a DataFrame; write statements (UNWIND/MERGE/SET/DELETE
        surface) apply to the store and commit, returning None."""
        from opencypher_datalayer_spark.plans import run_cypher, run_cypher_write
        from opencypher_datalayer_spark.plans.cypher import tokenize

        toks = tokenize(statement)
        is_read = any(t.kind == "kw" and t.value == "return" for t in toks)
        if is_read:
            return run_cypher(self._store, statement, params)
        self._commit(run_cypher_write(self._store, statement, params))
        return None

    def explain(self, statement: str, params: dict | None = None, mode: str = "formatted") -> str:
        """The physical plan a statement would execute, as a string —
        the public form of the plan audits ``tests/test_plan_audit.py``
        runs (verify broadcast shapes, pushed filters, pruned read
        schemas before paying for a query). Read statements explain the
        result DataFrame; write statements explain the post-write node
        frame WITHOUT committing anything. ``mode`` is any
        ``DataFrame.explain`` mode (``formatted`` shows exchange and
        join strategies; ``cost`` adds Catalyst's size estimates)."""
        import io
        from contextlib import redirect_stdout

        from opencypher_datalayer_spark.plans import run_cypher, run_cypher_write
        from opencypher_datalayer_spark.plans.cypher import tokenize

        toks = tokenize(statement)
        is_read = any(t.kind == "kw" and t.value == "return" for t in toks)
        df = (
            run_cypher(self._store, statement, params)
            if is_read
            else run_cypher_write(self._store, statement, params).nodes
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()

    # -- read side (S8/S9 — unsupported in the reference) --------------

    def entities(self, from_gid: str = "", limit: int = 100) -> DataFrame:
        """Paged node scan ordered by gid; ``from_gid`` is the page token."""
        nodes = self._store.nodes
        if from_gid:
            nodes = nodes.where(F.col("gid") > from_gid)
        return nodes.orderBy("gid").limit(limit)

    def get_entities(self, gids: list[str]) -> DataFrame:
        """Point lookup by gid. With durable storage this reads only the
        data files whose footer min/max range admits one of the keys
        (``storage.lookup_nodes`` — the gid-index analog, neo4j.go:21);
        in-memory mode filters the snapshot."""
        if self._storage is not None:
            return self._storage.lookup_nodes(self.spark, gids)
        return self._store.nodes.where(F.col("gid").isin(gids))

    def changes(self, since: int = 0) -> tuple[DataFrame, int]:
        """Change-data feed between snapshot versions (S8 — the
        reference answers LayerNotSupported; with versioned storage this
        is a real CDC diff). Returns (changes, current_version); the
        token for the next poll is the returned version.

        Change rows are the node envelope plus ``change_type``:
        ``upsert`` (new or modified since ``since``) or ``delete``
        (present at ``since``, gone now). In-memory mode (no storage)
        degrades to a full-snapshot upsert feed with version 0.
        """
        nodes = self._store.nodes
        upsert = F.lit("upsert").alias("change_type")
        if not self._storage:
            return nodes.select("*", upsert), 0
        version = self._storage.current_version()
        if since >= version:
            return nodes.limit(0).select("*", upsert), version
        if since <= 0:
            return nodes.select("*", upsert), version
        old = self._storage.load_version(self.spark, since).nodes
        # set-diff via canonical row fingerprint (exceptAll can't handle
        # MapType columns; sorted map entries make the hash stable)
        fp = F.md5(
            F.to_json(
                F.struct(
                    "label",
                    F.expr("array_sort(labels)").alias("ls"),
                    "source",
                    F.expr("array_sort(map_entries(props))").alias("p"),
                )
            )
        )
        new_fp = nodes.withColumn("_fp", fp)
        old_fp = old.withColumn("_fp", fp)
        changed = new_fp.join(old_fp.select("gid", "_fp"), ["gid", "_fp"], "left_anti").drop(
            "_fp"
        )
        deleted = old.join(nodes.select("gid"), "gid", "left_anti")
        return (
            changed.select("*", upsert).unionByName(
                deleted.select("*", F.lit("delete").alias("change_type"))
            ),
            version,
        )
