"""Shared discipline for per-dataset memoized frames.

Several registry families share an expensive upstream frame (the
MinHash signature frame in ``dedup``, the support-thresholded co-supply
projection in ``graphalgo``). Memoizing those is the right design —
clusters should reuse pairs' upstream — but every such cache must obey
two rules, both flagged by the round-3 verdict:

1. **Invalidate on data change**: the key must include a file-metadata
   fingerprint of the source parquet, because the test driver
   regenerates data under an unchanged path mid-session.
2. **Be clearable by the bench**: reported per-query minimums must
   measure recomputation, never a memo hit, so ``bench.py`` clears
   EVERY registered cache before each timed run via
   :func:`clear_memo_caches`.

New memo caches must call :func:`register_memo_cache` at module import
— that keeps the bench honest by construction instead of by each
author remembering to edit ``bench.py``.
"""

from __future__ import annotations

import os
from typing import Callable, MutableMapping

_CLEARERS: list[Callable[[], None]] = []


def register_memo_cache(cache: MutableMapping) -> None:
    """Register a module-level memo dict so the bench can clear it."""
    _CLEARERS.append(cache.clear)


def clear_memo_caches() -> None:
    """Drop every registered memoized frame (bench calls this before
    each timed run)."""
    for clear in _CLEARERS:
        clear()


def table_fingerprint(sf_dir: str, table: str) -> tuple:
    """(path, mtime_ns, size) of every file under ``{table}.parquet`` —
    the cache-invalidation key for anything memoized per dataset."""
    root = os.path.join(sf_dir, f"{table}.parquet")
    ent: list[tuple[str, int, int]] = []
    if os.path.isdir(root):
        for dp, _, fs in os.walk(root):
            for f in fs:
                p = os.path.join(dp, f)
                st = os.stat(p)
                ent.append((p, st.st_mtime_ns, st.st_size))
    elif os.path.exists(root):
        st = os.stat(root)
        ent.append((root, st.st_mtime_ns, st.st_size))
    return tuple(sorted(ent))
