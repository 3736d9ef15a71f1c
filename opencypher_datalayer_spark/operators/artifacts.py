"""Corpus-versioned standing artifacts — the amortization layer.

The operators a training pipeline runs daily (incremental near-dup
check, IVF ANN probe) derive expensive frames from the STANDING corpus:
the shingle/sets tables, the MinHash signature table, the IVF index and
codebook. Rebuilding those per invocation charges the whole corpus to
every batch — at the sf10 rehearsal that was 207.8 s per incremental
dedup call (the corpus re-shingled and re-shuffled each time) and ~76 s
of the IVF query was codebook training plus the index write. A 100 TB
deployment builds them ONCE per corpus version and amortizes across
batches; this module is that store.

Protocol (the same discipline as ``storage.py``'s graph snapshots, which
a cluster deployment would replace with Delta/Iceberg):

- An artifact is identified by ``(kind, key)`` where ``key`` is a
  content fingerprint of its inputs (file path + mtime + size of the
  source parquet, plus algorithm parameters). A changed corpus is a
  DIFFERENT artifact — stale reads are structurally impossible, no
  invalidation bookkeeping.
- Each artifact directory holds immutable version subdirs
  (``v00000001/...``) plus an atomic ``CURRENT`` pointer, so a reader
  always sees a complete committed version and a refresh (``commit``)
  is an atomic swap. Builders write into a pid-tagged tmp dir that is
  renamed into place; a crash mid-build leaves only a dead tmp.
- ``sweep`` reclaims dead tmp dirs (owner pid gone) and
  non-current versions; ``drop`` removes artifacts outright (what the
  bench uses to time cold builds).

The reference layer has no analog (it delegates persistence to Neo4j,
``layer.go:257-265``); this is infrastructure for the engine's
training-data-pipeline extension.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import uuid
from typing import Callable

_CURRENT = "CURRENT"
_KEY_FILE = "KEY.json"


def _default_root() -> str:
    return os.environ.get(
        "SPARK_GRAFT_ARTIFACTS",
        os.path.join(tempfile.gettempdir(), "spark_graft_artifacts"),
    )


class ArtifactStore:
    """Filesystem store of standing corpus artifacts.

    Safe for concurrent processes sharing one root: commits are atomic
    renames, the CURRENT pointer swaps via ``os.replace``, and a loser
    of a commit race discards its tmp and adopts the winner (artifacts
    for the same key are deterministic functions of the same inputs).
    """

    def __init__(self, root: str | None = None):
        self.root = root or _default_root()

    # -- identity ------------------------------------------------------

    def _adir(self, kind: str, key: tuple) -> str:
        digest = hashlib.md5(repr((kind, key)).encode()).hexdigest()[:12]
        return os.path.join(self.root, f"{kind}_{digest}")

    # -- read ----------------------------------------------------------

    def current_dir(self, kind: str, key: tuple) -> str | None:
        """Committed current version dir, or None if absent."""
        adir = self._adir(kind, key)
        try:
            with open(os.path.join(adir, _CURRENT)) as f:
                vname = f.read().strip()
        except OSError:
            return None
        vdir = os.path.join(adir, vname)
        return vdir if os.path.isdir(vdir) else None

    # -- write ---------------------------------------------------------

    def commit(self, kind: str, key: tuple, builder: Callable[[str], None]) -> str:
        """Build a NEW version with ``builder(tmp_dir)`` and publish it
        atomically. Returns the committed version dir."""
        adir = self._adir(kind, key)
        os.makedirs(adir, exist_ok=True)
        self._write_key(adir, kind, key)
        tmp = os.path.join(adir, f"_tmp_{uuid.uuid4().hex[:8]}_p{os.getpid()}")
        os.makedirs(tmp)
        try:
            builder(tmp)
            for attempt in range(100):
                vname = f"v{self._max_version(adir) + 1 + attempt:08d}"
                vdir = os.path.join(adir, vname)
                try:
                    os.rename(tmp, vdir)
                    break
                except OSError:
                    continue  # another process took the slot — next number
            else:  # pragma: no cover - pathological contention
                raise OSError(f"could not allocate a version slot in {adir}")
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        # atomic pointer swap (same idiom as storage.py's CURRENT)
        ptr = os.path.join(adir, f"_cur_{os.getpid()}_{uuid.uuid4().hex[:6]}")
        with open(ptr, "w") as f:
            f.write(vname)
        os.replace(ptr, os.path.join(adir, _CURRENT))
        return vdir

    def get_or_build(self, kind: str, key: tuple, builder: Callable[[str], None]) -> str:
        """Current version if committed, else build one. A commit race
        is benign — the artifact is a deterministic function of ``key``'s
        inputs, so either version is correct."""
        cur = self.current_dir(kind, key)
        if cur is not None:
            return cur
        return self.commit(kind, key, builder)

    def commit_extension(
        self, kind: str, key: tuple, builder: Callable[[str], None]
    ) -> str:
        """Commit a new version that EXTENDS the current one: the tmp
        dir handed to ``builder`` starts as a hard-linked copy of the
        current version's tree (zero data copied — the storage.py
        pruned-MERGE idiom), so the builder only appends delta files.
        The prior version stays intact until ``sweep`` reclaims it;
        readers of either version always see a complete tree.

        Concurrency contract: extensions must be SERIALIZED by the
        caller (single-writer ingest, the same discipline as the graph
        store's merge commits). Two concurrent extenders would each
        link from the SAME base version and the later pointer swap
        would silently drop the earlier delta — unlike plain
        ``commit`` races, where either full rebuild is correct."""
        cur = self.current_dir(kind, key)
        if cur is None:
            raise FileNotFoundError(f"no committed version to extend: {kind} {key!r}")

        def extended(tmp: str) -> None:
            _link_tree(cur, tmp)
            builder(tmp)

        return self.commit(kind, key, extended)

    def _write_key(self, adir: str, kind: str, key: tuple) -> None:
        p = os.path.join(adir, _KEY_FILE)
        if not os.path.exists(p):
            tmp = p + f".{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump({"kind": kind, "key": repr(key)}, f)
            os.replace(tmp, p)

    @staticmethod
    def _max_version(adir: str) -> int:
        vs = [
            int(name[1:])
            for name in os.listdir(adir)
            if name.startswith("v") and name[1:].isdigit()
        ]
        return max(vs, default=0)

    # -- reclamation ---------------------------------------------------

    def drop(self, kind: str | None = None) -> None:
        """Remove artifacts (all, or every version of one ``kind``).
        What the bench calls before timing a cold build."""
        if not os.path.isdir(self.root):
            return
        for name in os.listdir(self.root):
            if kind is None or name.startswith(f"{kind}_"):
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)

    def sweep(self, keep_versions: int = 1) -> list[str]:
        """Reclaim (a) tmp dirs whose owner pid is dead — crashed or
        abandoned builds — and (b) versions older than the newest
        ``keep_versions`` (the CURRENT version is always kept). Live
        tmp dirs (owner still running) are never touched. Returns the
        removed paths."""
        removed: list[str] = []
        if not os.path.isdir(self.root):
            return removed
        for name in os.listdir(self.root):
            adir = os.path.join(self.root, name)
            if not os.path.isdir(adir):
                continue
            try:
                with open(os.path.join(adir, _CURRENT)) as f:
                    current = f.read().strip()
            except OSError:
                current = ""
            versions = sorted(
                v for v in os.listdir(adir) if v.startswith("v") and v[1:].isdigit()
            )
            cut = versions[-keep_versions:] if keep_versions > 0 else []
            for entry in os.listdir(adir):
                p = os.path.join(adir, entry)
                if entry.startswith("_tmp_") and not _pid_alive(_tmp_pid(entry)):
                    shutil.rmtree(p, ignore_errors=True)
                    removed.append(p)
                elif (
                    entry.startswith("v")
                    and entry[1:].isdigit()
                    and entry != current
                    and entry not in cut
                ):
                    shutil.rmtree(p, ignore_errors=True)
                    removed.append(p)
        return removed


def _link_tree(src: str, dst: str) -> None:
    """Replicate ``src``'s tree under ``dst`` with hard links (same
    filesystem; parquet files are immutable once committed, so shared
    inodes are safe)."""
    for dirpath, _, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            os.link(os.path.join(dirpath, f), os.path.join(out, f))


def _tmp_pid(name: str) -> int:
    try:
        return int(name.rsplit("_p", 1)[1])
    except (IndexError, ValueError):
        return -1


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


_DEFAULT: ArtifactStore | None = None


def default_store() -> ArtifactStore:
    """Process-wide store rooted at ``$SPARK_GRAFT_ARTIFACTS`` (default
    under the system tempdir). NOT registered with the bench's memo
    clearers — surviving cache clears is the entire point; the bench
    drops artifacts explicitly when it times a cold build."""
    global _DEFAULT
    if _DEFAULT is None or _DEFAULT.root != _default_root():
        _DEFAULT = ArtifactStore()
    return _DEFAULT
