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

import glob
import json
import os
import shutil
import tempfile
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.model import EDGES_SCHEMA, NODES_SCHEMA
from opencypher_datalayer_spark.store import GraphStore

_CURRENT = "CURRENT"
_MANIFEST = "MANIFEST.json"
_LOCK = "COMMIT.lock"

# Key column used for file-skipping stats per table (the reference's only
# index is on ``gid`` — ``neo4j.go:21``; edges are looked up by src gid in
# the edge-clear / expand paths). Edges additionally record ``dst`` stats
# so tombstone DETACH (which removes edges incident in EITHER direction)
# can prune too.
_STATS_KEY = {"nodes": "gid", "edges": "src"}
_EXTRA_STATS = {"edges": ["dst"]}


def _file_key_stats(path: str, keys: list[str]) -> tuple[dict[str, tuple], int]:
    """Min/max of each ``keys`` column across a parquet file's row groups,
    from the footer only (no data pages read — driver-side, O(files) not
    O(rows)). Returns {key: (min, max)} and the row count."""
    md = pq.ParquetFile(path).metadata
    stats: dict[str, tuple] = {k: (None, None) for k in keys}
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for c in range(rg.num_columns):
            col = rg.column(c)
            if col.path_in_schema not in stats:
                continue
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            if isinstance(lo, bytes):
                lo = lo.decode("utf-8", "replace")
            if isinstance(hi, bytes):
                hi = hi.decode("utf-8", "replace")
            mn, mx = stats[col.path_in_schema]
            stats[col.path_in_schema] = (
                lo if mn is None else min(mn, lo),
                hi if mx is None else max(mx, hi),
            )
    return stats, md.num_rows


def _prune(entries: list[dict], values: list[str]) -> list[dict]:
    """Keep manifest entries whose [min,max] key range could contain any of
    ``values``. Entries without stats are kept (never unsound)."""
    kept = []
    for e in entries:
        if e["min"] is None or e["max"] is None:
            if e["rows"]:
                kept.append(e)
            continue
        if any(e["min"] <= v <= e["max"] for v in values):
            kept.append(e)
    return kept


def _prune_edge_files(
    entries: list[dict], src_keys: list[str], dst_keys: list[str]
) -> list[dict]:
    """Edge files that may hold an edge affected by the batch: src range
    admits a batch id (edge clear / detach / re-add) OR dst range admits a
    tombstoned id (detach removes edges in either direction). Files
    without stats for a needed side are kept — pruning must never skip a
    file that could contain an affected row."""
    kept = []
    for e in entries:
        if not e["rows"]:
            continue
        src_unknown = e["min"] is None or e["max"] is None
        hit = src_unknown and bool(src_keys)
        if not src_unknown and any(e["min"] <= k <= e["max"] for k in src_keys):
            hit = True
        if not hit and dst_keys:
            dmn, dmx = e.get("dst_min"), e.get("dst_max")
            if dmn is None or dmx is None:  # pre-dst-stats manifest
                hit = True
            elif any(dmn <= k <= dmx for k in dst_keys):
                hit = True
        if hit:
            kept.append(e)
    return kept


def _with_labels(nodes: DataFrame) -> DataFrame:
    """Canonical node projection. ``labels`` is coalesced through the
    scalar ``label`` so snapshots written before the multi-label column
    (whose parquet files lack it -> null) read back as single-label."""
    return nodes.select(
        "gid",
        "label",
        F.coalesce(
            F.col("labels"),
            F.when(F.col("label").isNotNull(), F.array("label")).otherwise(
                F.array().cast("array<string>")
            ),
        ).alias("labels"),
        "source",
        "props",
    )


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

    # -- writer serialization ------------------------------------------

    # The reference inherits per-batch transactions from Neo4j
    # (neo4j.go:238-284); here concurrent writers are serialized with an
    # O_EXCL lock-file claim so two simultaneous commits can't both read
    # version v and publish conflicting v+1 snapshots (one batch would
    # silently vanish). The loser spins with backoff and then commits on
    # top of the winner's version — both batches survive, versions stay
    # linear. A writer that dies mid-commit leaves a lock that is broken
    # after ``stale_after`` (the claim records pid + wall time).
    #
    # SCOPE: this lock is SINGLE-HOST. O_EXCL is not reliable on NFS and
    # has no analog on object storage — for multi-host writers use the
    # ``txnlog`` backend (TxnLogGraphStorage), whose put-if-absent log
    # publish replaces both this lock and the mutable CURRENT pointer.

    def _acquire_commit_lock(self, timeout: float = 300.0, stale_after: float = 600.0) -> None:
        path = os.path.join(self.root, _LOCK)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as f:
                    json.dump({"pid": os.getpid(), "ts": time.time()}, f)
                return
            except FileExistsError:
                try:
                    with open(path) as f:
                        held = json.load(f)
                    if time.time() - held.get("ts", 0) > stale_after:
                        os.unlink(path)  # break a dead writer's claim
                        continue
                except (OSError, ValueError):
                    pass  # holder mid-write or already released; retry
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock at {path} not acquired within {timeout}s"
                    )
                time.sleep(0.05)

    def _release_commit_lock(self) -> None:
        try:
            os.unlink(os.path.join(self.root, _LOCK))
        except FileNotFoundError:
            pass

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
        nodes = _with_labels(
            spark.read.schema(NODES_SCHEMA).parquet(os.path.join(vdir, "nodes"))
        )
        edges = (
            spark.read.schema(EDGES_SCHEMA)
            .parquet(os.path.join(vdir, "edges"))
            .select("src", "rel_type", "dst", "source")
        )
        return GraphStore(nodes, edges)

    def commit(self, store: GraphStore, cluster_buckets: int | None = None) -> int:
        """Write a new snapshot version and atomically repoint CURRENT.

        ``cluster_buckets``: range-partition each table on its key column
        (nodes by ``gid``, edges by ``src``) before writing, so each data
        file covers a narrow, disjoint key range and the footer min/max
        stats recorded in MANIFEST.json actually prune (the Z-order /
        ``OPTIMIZE`` analog for a single key — reference's gid index,
        ``neo4j.go:21``). Costs one extra shuffle + range-sampling job per
        commit, so it's opt-in: the frequent small commits of the sync
        service skip it; periodic compaction / analytic snapshots enable it.
        Footer stats are collected either way (cheap, driver-side).
        """
        self._acquire_commit_lock()
        try:
            return self._commit_locked(store, cluster_buckets)
        finally:
            self._release_commit_lock()

    def _commit_locked(self, store: GraphStore, cluster_buckets: int | None = None) -> int:
        v = self.current_version() + 1
        vdir = self._version_dir(v)
        nodes, edges = store.nodes, store.edges
        if cluster_buckets:
            nodes = nodes.repartitionByRange(cluster_buckets, "gid")
            edges = edges.repartitionByRange(cluster_buckets, "src")
        nodes.write.mode("overwrite").partitionBy("label").parquet(
            os.path.join(vdir, "nodes")
        )
        edges.write.mode("overwrite").partitionBy("rel_type").parquet(
            os.path.join(vdir, "edges")
        )
        self._write_manifest(vdir)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.root, _CURRENT))  # atomic pointer swap
        return v

    # -- file-skipping manifest (the gid-index analog, C6) -------------

    def _write_manifest(self, vdir: str, carry: dict | None = None) -> None:
        """Collect per-file key-range stats into MANIFEST.json.

        ``carry`` maps relpath -> prior manifest entry for files that
        were hard-linked unchanged from the previous version: their
        footer stats cannot have changed, so re-reading them is pure
        waste — and at scale it is the commit-latency driver (the write
        rehearsal measured the full re-stat at ~0.1 ms/file driver-side:
        ~100 s per micro-batch commit on a million-file store; with the
        carry a pruned MERGE stats only the handful of files it
        actually wrote)."""
        carry = carry or {}
        manifest: dict[str, list[dict]] = {}
        for table, key in _STATS_KEY.items():
            keys = [key] + _EXTRA_STATS.get(table, [])
            entries = []
            tdir = os.path.join(vdir, table)
            for path in sorted(
                glob.glob(os.path.join(tdir, "**", "*.parquet"), recursive=True)
            ):
                rel = os.path.relpath(path, vdir)
                prior = carry.get(rel)
                if prior is not None:
                    entries.append(prior)
                    continue
                stats, rows = _file_key_stats(path, keys)
                entry = {
                    "path": rel,
                    "rows": rows,
                    "min": stats[key][0],
                    "max": stats[key][1],
                }
                for extra in _EXTRA_STATS.get(table, []):
                    entry[f"{extra}_min"], entry[f"{extra}_max"] = stats[extra]
                entries.append(entry)
            manifest[table] = entries
        with open(os.path.join(vdir, _MANIFEST), "w") as f:
            json.dump(manifest, f)

    def _manifest(self, v: int) -> dict | None:
        path = os.path.join(self._version_dir(v), _MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def pruned_files(self, table: str, values: list[str], version: int | None = None) -> tuple[list[str], int] | None:
        """File paths whose key range may contain any of ``values``, and the
        total file count — or ``None`` when no manifest exists (pre-manifest
        snapshot: caller falls back to a full scan)."""
        v = self.current_version() if version is None else version
        manifest = self._manifest(v)
        if manifest is None or table not in manifest:
            return None
        entries = manifest[table]
        vdir = self._version_dir(v)
        kept = _prune(entries, values)
        return [os.path.join(vdir, e["path"]) for e in kept], len(entries)

    def lookup_nodes(self, spark: SparkSession, gids: list[str], version: int | None = None) -> DataFrame:
        """Point lookup of nodes by gid, scanning only files whose footer
        min/max range admits one of the keys.

        This is the read-side payoff of the manifest: at 100 TB a batch
        MERGE or entity lookup touches the few files holding its gids
        instead of the whole table — the same job the reference delegates
        to Neo4j's gid index (``neo4j.go:21``, ``neo4j.go:97``).
        """
        v = self.current_version() if version is None else version
        pruned = self.pruned_files("nodes", gids, v)
        if pruned is None:
            return self.load_version(spark, v).nodes.where(F.col("gid").isin(gids))
        files, _total = pruned
        if not files:
            return GraphStore.empty(spark).nodes
        vdir = self._version_dir(v)
        df = _with_labels(
            spark.read.schema(NODES_SCHEMA)
            .option("basePath", os.path.join(vdir, "nodes"))
            .parquet(*files)
        )
        return df.where(F.col("gid").isin(gids))

    # -- pruned MERGE commit (the write-side payoff of C6) --------------

    # Above this many batch rows, collecting keys driver-side stops being
    # metadata-scale; bulk loads take the full-commit path instead.
    MERGE_MAX_BATCH_ROWS = 100_000

    def merge_commit(
        self, spark: SparkSession, batch: DataFrame, label: str, source: str
    ) -> int:
        """Apply one entity batch and commit, rewriting ONLY the data
        files whose key range intersects the batch — everything else is
        carried into the new version as a hard link (zero data movement).

        This is the real payoff of the gid-range manifest at 100 TB: the
        reference's per-batch transaction touches the few Neo4j pages its
        gid index points at (``neo4j.go:21``); a commit that rewrites the
        whole table would be the equivalent of a full reindex per batch.
        Here the batch's key set selects the files to rewrite:

        - nodes: any file whose gid range admits a batch id (upsert or
          tombstone) or a reference target (stub check) — pruning
          soundness guarantees every existing row with an affected gid
          is inside a selected file, so stub dedup against the subset is
          exact;
        - edges: any file whose src range admits a batch id (edge clear,
          tombstone detach, new edges) or whose dst range admits a
          tombstoned id (detach removes edges in either direction).

        The selected subset is loaded as a miniature GraphStore and the
        ordinary ``apply_batch`` runs on it — bit-identical semantics to
        the full path, just restricted to the files that can change.
        Repeated merges append small un-clustered files; a periodic
        ``commit(store, cluster_buckets=N)`` is the compaction that
        re-tightens the ranges (OPTIMIZE's role in a table format).

        Falls back to a full commit when there is no manifest yet or the
        batch is too large to key-collect driver-side.
        """
        self._acquire_commit_lock()
        try:
            return self._merge_commit_locked(spark, batch, label, source)
        finally:
            self._release_commit_lock()

    def _merge_commit_locked(
        self, spark: SparkSession, batch: DataFrame, label: str, source: str
    ) -> int:
        v = self.current_version()
        manifest = self._manifest(v)
        if v == 0 or manifest is None:
            return self._commit_locked(self.load(spark).apply_batch(batch, label, source))
        keys = batch.select(
            "id", "deleted", F.flatten(F.map_values("refs")).alias("targets")
        ).limit(self.MERGE_MAX_BATCH_ROWS + 1).collect()
        if len(keys) > self.MERGE_MAX_BATCH_ROWS:
            return self._commit_locked(self.load(spark).apply_batch(batch, label, source))
        dead = sorted({r["id"] for r in keys if r["deleted"]})
        live = sorted({r["id"] for r in keys if not r["deleted"]})
        targets = sorted(
            {t for r in keys if not r["deleted"] for t in (r["targets"] or [])}
        )
        node_keys = sorted(set(live) | set(dead) | set(targets))
        vdir = self._version_dir(v)

        node_hit = {e["path"] for e in _prune(manifest["nodes"], node_keys)}
        edge_hit = {
            e["path"]
            for e in _prune_edge_files(manifest["edges"], live + dead, dead)
        }

        sub = GraphStore(
            self._read_files(spark, vdir, "nodes", sorted(node_hit)),
            self._read_files(spark, vdir, "edges", sorted(edge_hit)),
        )
        merged = sub.apply_batch(batch, label, source)

        new_v = v + 1
        new_vdir = self._version_dir(new_v)
        for table, hit in (("nodes", node_hit), ("edges", edge_hit)):
            for e in manifest[table]:
                if e["path"] in hit:
                    continue
                src_path = os.path.join(vdir, e["path"])
                dst_path = os.path.join(new_vdir, e["path"])
                os.makedirs(os.path.dirname(dst_path), exist_ok=True)
                try:
                    os.link(src_path, dst_path)  # zero-copy carry-forward
                except OSError:
                    shutil.copy2(src_path, dst_path)  # cross-device fallback
        merged.nodes.write.mode("append").partitionBy("label").parquet(
            os.path.join(new_vdir, "nodes")
        )
        merged.edges.write.mode("append").partitionBy("rel_type").parquet(
            os.path.join(new_vdir, "edges")
        )
        carry = {
            e["path"]: e
            for table, hit in (("nodes", node_hit), ("edges", edge_hit))
            for e in manifest[table]
            if e["path"] not in hit
        }
        self._write_manifest(new_vdir, carry=carry)
        fd, tmp = tempfile.mkstemp(dir=self.root)
        with os.fdopen(fd, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, os.path.join(self.root, _CURRENT))
        return new_v

    def compact(self, spark: SparkSession, cluster_buckets: int = 8) -> int:
        """Rewrite the current version range-clustered — the OPTIMIZE
        role in a table format. Repeated ``merge_commit``s each append a
        few small files with overlapping key ranges, which slowly erodes
        manifest pruning selectivity; compaction loads the live snapshot
        once, range-partitions each table on its merge key, and commits
        a fresh version whose files cover narrow disjoint ranges (old
        versions stay readable for time travel until ``vacuum``)."""
        return self.commit(self.load(spark), cluster_buckets=cluster_buckets)

    def file_count(self, table: str, version: int | None = None) -> int:
        v = self.current_version() if version is None else version
        tdir = os.path.join(self._version_dir(v), table)
        return len(glob.glob(os.path.join(tdir, "**", "*.parquet"), recursive=True))

    def _read_files(
        self, spark: SparkSession, vdir: str, table: str, rel_paths: list[str]
    ) -> DataFrame:
        schema = NODES_SCHEMA if table == "nodes" else EDGES_SCHEMA
        if not rel_paths:
            df = spark.createDataFrame([], schema)
        else:
            df = (
                spark.read.schema(schema)
                .option("basePath", os.path.join(vdir, table))
                .parquet(*[os.path.join(vdir, p) for p in rel_paths])
            )
        if table == "nodes":
            return _with_labels(df)
        return df.select("src", "rel_type", "dst", "source")

    def vacuum(self, keep: int = 2) -> None:
        """Drop version directories older than the newest ``keep``."""
        current = self.current_version()
        for name in sorted(os.listdir(self.root)):
            if name.startswith("v") and name[1:].isdigit():
                v = int(name[1:])
                if v <= current - keep:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)


class TxnLogGraphStorage(ParquetGraphStorage):
    """Transactional-manifest backend: multi-host commit safety without
    the O_EXCL lock file or the mutable CURRENT pointer.

    The base class is correct on one host but its two coordination
    primitives degrade on shared filesystems: O_EXCL is not reliable on
    NFS, and a mutable pointer file has no atomic read-modify-write on
    object storage. This backend replaces both with a Delta-style
    append-only transaction log — the same protocol a lakehouse table
    format uses, expressed on a filesystem:

    - every snapshot's data lives in a uniquely-named immutable
      directory (``d-<uuid>``), written BEFORE any coordination;
    - version N is published by creating ``_log/{N:08d}.json``
      (recording the data directory) with a put-if-absent primitive;
      the reader's current version is simply the highest log entry —
      readers never block and never see a partial commit;
    - put-if-absent is the NFS-safe hard-link protocol (open(2) NOTES:
      create a unique temp file, ``link()`` it to the target, verify
      ``st_nlink == 2`` — correct even when the link RPC's reply is
      lost and retried); on object storage the same slot maps to a
      conditional put (If-None-Match), which is exactly Delta's
      commit primitive;
    - a writer that loses the race re-reads the new current version
      and retries: ``merge_commit`` rebuilds its delta against the
      winner's snapshot (both batches survive — the reference's
      serialized per-batch transactions, ``neo4j.go:238-284``), while
      full ``commit`` re-publishes its self-contained snapshot at the
      next slot (full sync is authoritative last-writer-wins, as in
      the base class and W10's wipe semantics).

    Everything above the commit protocol — manifest stats, pruned
    merge, clustering, compaction, time travel — is inherited
    unchanged from ``ParquetGraphStorage``.
    """

    _LOG = "_log"

    def __init__(self, root: str):
        super().__init__(root)
        os.makedirs(os.path.join(root, self._LOG), exist_ok=True)
        self._dir_cache: dict[int, str] = {}

    # -- log ------------------------------------------------------------

    def _log_path(self, v: int) -> str:
        return os.path.join(self.root, self._LOG, f"{v:08d}.json")

    def current_version(self) -> int:
        versions = [
            int(name[:-5])
            for name in os.listdir(os.path.join(self.root, self._LOG))
            if name.endswith(".json") and name[:-5].isdigit()
        ]
        return max(versions, default=0)

    def _version_dir(self, version: int) -> str:
        if version in self._dir_cache:
            return self._dir_cache[version]
        path = self._log_path(version)
        try:
            with open(path) as f:
                entry = json.load(f)
        except (FileNotFoundError, ValueError):
            # unknown version: a path that cannot exist, so callers'
            # isdir/exists probes fail the same way as in the base class
            return os.path.join(self.root, f"_missing-v{version}")
        vdir = os.path.join(self.root, entry["dir"])
        self._dir_cache[version] = vdir
        return vdir

    def _publish(self, v: int, dirname: str) -> bool:
        """Put-if-absent of the version-v log entry. True iff this
        writer won slot v."""
        log_dir = os.path.join(self.root, self._LOG)
        tmp = os.path.join(log_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": v, "dir": dirname}, f)
        target = self._log_path(v)
        try:
            try:
                os.link(tmp, target)
                won = True
            except FileExistsError:
                won = False
            except OSError:
                # NFS: the link may have succeeded even though the
                # retried RPC reported an error — nlink is the truth
                won = os.stat(tmp).st_nlink == 2
        finally:
            os.unlink(tmp)
        return won

    # -- commits ---------------------------------------------------------

    def _write_snapshot(
        self, store: GraphStore, cluster_buckets: int | None = None
    ) -> str:
        dirname = f"d-{uuid.uuid4().hex}"
        vdir = os.path.join(self.root, dirname)
        nodes, edges = store.nodes, store.edges
        if cluster_buckets:
            nodes = nodes.repartitionByRange(cluster_buckets, "gid")
            edges = edges.repartitionByRange(cluster_buckets, "src")
        nodes.write.mode("overwrite").partitionBy("label").parquet(
            os.path.join(vdir, "nodes")
        )
        edges.write.mode("overwrite").partitionBy("rel_type").parquet(
            os.path.join(vdir, "edges")
        )
        self._write_manifest(vdir)
        return dirname

    def _touch_publish_dir(self, dirname: str) -> bool:
        """Restart ``gc_orphans``' min-age clock on the about-to-publish
        data dir. False iff the dir is already gone — a writer stalled
        past ``min_age_s`` whose dir GC collected must rebuild before
        publishing (ADVICE r6 #3)."""
        try:
            os.utime(os.path.join(self.root, dirname))
            return True
        except OSError:
            return False

    def _finalize_publish(self, v: int, dirname: str, rebuild) -> int:
        """Close the remaining ``gc_orphans`` race: if GC collected the
        data dir in the sliver between the utime guard and the log-entry
        link, the freshly-won entry points at nothing and every reader
        of version ``v`` would break. Rebuild the content and atomically
        rewrite OUR OWN slot — safe because ``_publish``'s put-if-absent
        means no other writer ever writes slot ``v``."""
        if os.path.isdir(os.path.join(self.root, dirname)):
            return v
        new_dir = rebuild()
        tmp = os.path.join(self.root, self._LOG, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": v, "dir": new_dir}, f)
        os.replace(tmp, self._log_path(v))
        self._dir_cache.pop(v, None)
        return v

    def commit(self, store: GraphStore, cluster_buckets: int | None = None) -> int:
        # data first (expensive, uncoordinated), then CAS-publish the
        # log entry; on a lost race the snapshot is still self-contained
        # and valid, so only the (cheap) publish retries
        dirname = self._write_snapshot(store, cluster_buckets)
        rebuild = lambda: self._write_snapshot(store, cluster_buckets)
        while True:
            v = self.current_version() + 1
            if not self._touch_publish_dir(dirname):
                dirname = rebuild()  # collected by GC during a long stall
            if self._publish(v, dirname):
                return self._finalize_publish(v, dirname, rebuild)

    def merge_commit(
        self, spark: SparkSession, batch: DataFrame, label: str, source: str
    ) -> int:
        # optimistic concurrency: build the delta against the current
        # snapshot, publish; a lost race discards the built directory
        # and rebuilds against the winner's version, so concurrent
        # batches compose instead of overwriting each other
        while True:
            base_v = self.current_version()
            manifest = self._manifest(base_v)
            if base_v == 0 or manifest is None:
                merged = self.load(spark).apply_batch(batch, label, source)
                build = lambda m=merged: self._write_snapshot(m)
            else:
                build = lambda b=base_v, m=manifest: self._build_merge_dir(
                    spark, batch, label, source, b, m
                )
            dirname = build()
            if not self._touch_publish_dir(dirname):
                dirname = build()  # collected by GC during a long stall
            if self._publish(base_v + 1, dirname):
                return self._finalize_publish(base_v + 1, dirname, build)
            shutil.rmtree(os.path.join(self.root, dirname), ignore_errors=True)

    def _build_merge_dir(
        self,
        spark: SparkSession,
        batch: DataFrame,
        label: str,
        source: str,
        v: int,
        manifest: dict,
    ) -> str:
        """The pruned-MERGE body of the base class, writing into a
        uniquely-named directory instead of ``v{N+1}`` (same file
        selection, same carry-forward links, same apply_batch)."""
        keys = batch.select(
            "id", "deleted", F.flatten(F.map_values("refs")).alias("targets")
        ).limit(self.MERGE_MAX_BATCH_ROWS + 1).collect()
        if len(keys) > self.MERGE_MAX_BATCH_ROWS:
            return self._write_snapshot(self.load(spark).apply_batch(batch, label, source))
        dead = sorted({r["id"] for r in keys if r["deleted"]})
        live = sorted({r["id"] for r in keys if not r["deleted"]})
        targets = sorted(
            {t for r in keys if not r["deleted"] for t in (r["targets"] or [])}
        )
        node_keys = sorted(set(live) | set(dead) | set(targets))
        vdir = self._version_dir(v)
        node_hit = {e["path"] for e in _prune(manifest["nodes"], node_keys)}
        edge_hit = {
            e["path"]
            for e in _prune_edge_files(manifest["edges"], live + dead, dead)
        }
        sub = GraphStore(
            self._read_files(spark, vdir, "nodes", sorted(node_hit)),
            self._read_files(spark, vdir, "edges", sorted(edge_hit)),
        )
        merged = sub.apply_batch(batch, label, source)
        dirname = f"d-{uuid.uuid4().hex}"
        new_vdir = os.path.join(self.root, dirname)
        for table, hit in (("nodes", node_hit), ("edges", edge_hit)):
            for e in manifest[table]:
                if e["path"] in hit:
                    continue
                src_path = os.path.join(vdir, e["path"])
                dst_path = os.path.join(new_vdir, e["path"])
                os.makedirs(os.path.dirname(dst_path), exist_ok=True)
                try:
                    os.link(src_path, dst_path)  # zero-copy carry-forward
                except OSError:
                    shutil.copy2(src_path, dst_path)
        merged.nodes.write.mode("append").partitionBy("label").parquet(
            os.path.join(new_vdir, "nodes")
        )
        merged.edges.write.mode("append").partitionBy("rel_type").parquet(
            os.path.join(new_vdir, "edges")
        )
        carry = {
            e["path"]: e
            for table, hit in (("nodes", node_hit), ("edges", edge_hit))
            for e in manifest[table]
            if e["path"] not in hit
        }
        self._write_manifest(new_vdir, carry=carry)
        return dirname

    def vacuum(self, keep: int = 2) -> None:
        """Drop data directories (and their log entries) older than the
        newest ``keep`` versions. Version numbering stays monotonic:
        current is the MAX log entry, which vacuum never removes."""
        current = self.current_version()
        for v in range(1, current - keep + 1):
            path = self._log_path(v)
            try:
                with open(path) as f:
                    entry = json.load(f)
            except (FileNotFoundError, ValueError):
                continue
            shutil.rmtree(os.path.join(self.root, entry["dir"]), ignore_errors=True)
            os.unlink(path)
            self._dir_cache.pop(v, None)

    def gc_orphans(self, min_age_s: float = 3600.0) -> list[str]:
        """Remove ``d-<uuid>`` data directories referenced by NO log
        entry — the residue of a writer killed between its (expensive,
        uncoordinated) data write and the (cheap) ``_publish``, or of a
        lost merge race whose cleanup was interrupted. Orphans are
        invisible to readers (the log is the only path to data), so
        removing a TRUE orphan is pure space reclamation.

        ``min_age_s`` guards the racy window: a LIVE writer that has
        written its directory but not yet published looks like an
        orphan. Misidentifying it is worse than lost work — the
        writer's publish would still win and point CURRENT at a deleted
        directory — so the commit path defends in depth: it
        ``os.utime``-refreshes the dir immediately before publishing
        (``_touch_publish_dir``, restarting this age clock), and after
        winning the slot re-verifies the dir and rebuilds + rewrites
        its own log entry if GC got it anyway (``_finalize_publish``).
        A stalled writer therefore never leaves a dangling published
        version. Returns the removed directory names."""
        import time

        referenced: set[str] = set()
        log_dir = os.path.join(self.root, self._LOG)
        for name in os.listdir(log_dir):
            if not (name.endswith(".json") and name[:-5].isdigit()):
                continue
            try:
                with open(os.path.join(log_dir, name)) as f:
                    referenced.add(json.load(f)["dir"])
            except (ValueError, KeyError, OSError):
                continue
        removed: list[str] = []
        now = time.time()
        for name in os.listdir(self.root):
            if not name.startswith("d-") or name in referenced:
                continue
            path = os.path.join(self.root, name)
            try:
                if not os.path.isdir(path) or now - os.stat(path).st_mtime < min_age_s:
                    continue
            except OSError:
                continue
            shutil.rmtree(path, ignore_errors=True)
            removed.append(name)
        return removed


BACKENDS = {"parquet": ParquetGraphStorage, "txnlog": TxnLogGraphStorage}


def open_storage(root: str, backend: str = "parquet") -> ParquetGraphStorage:
    """Backend-selectable storage factory: ``parquet`` (versioned dirs +
    CURRENT pointer + O_EXCL commit lock; single-host) or ``txnlog``
    (append-only transaction log + put-if-absent publish; multi-host)."""
    try:
        cls = BACKENDS[backend]
    except KeyError:
        raise ValueError(
            f"unknown storage backend {backend!r}; choose from {sorted(BACKENDS)}"
        ) from None
    return cls(root)
