"""Pushdown-safe predicate builders.

A bounded id list applied as ``col IN (...)`` is the engine's
point-fetch idiom (the IVF rerank's vec_id fetch, BM25's WAND-style
skip-to-candidate): the list must reach the parquet reader as an
``In``/``InSet`` source filter so footer statistics prune row groups.
Two traps, both measured:

- **Literal type.** ``isin(python_ints)`` on a bigint column makes
  Catalyst wrap the COLUMN in a cast to the literals' narrower type,
  which defeats the parquet pushdown entirely. The literals must be
  int64.
- **Per-literal Column construction.** ``[F.lit(i).cast("bigint") for i
  in ids]`` costs one py4j round-trip per element: measured 15.5 s to
  BUILD 10k literals and 140 s for 100k, plus a 12.9 s analysis pass —
  more than the scans it prunes. A single SQL fragment with
  ``L``-suffixed bigint literals parses in one py4j call: measured
  0.05 s build + 2.9 s end-to-end at 100k ids on the same frame, with
  the ``PushedFilters: [In(doc_id, ...)]`` plan intact.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def isin_bigint(col_name: str, ids: Iterable[int]) -> Column:
    """``col IN (<ids>)`` with int64 literals, built as ONE parsed SQL
    fragment — O(1) py4j round-trips regardless of list size, and the
    predicate reaches the parquet scan as a pushed-down ``In`` filter
    (column untouched by casts). ``ids`` must be non-empty."""
    body = ",".join(f"{int(i)}L" for i in ids)
    if not body:
        raise ValueError("isin_bigint needs a non-empty id list")
    return F.expr(f"{col_name} IN ({body})")
