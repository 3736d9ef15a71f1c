"""Arrow-backed construction of small driver-local DataFrames.

``spark.createDataFrame(list_of_rows, schema)`` takes the pickled-RDD
path: every downstream job that touches the frame forks Python worker
processes to unpickle the rows, even when the frame is 300 rows of
ints.  Measured on this harness (local[32], warm JVM) that costs
4-6 s *per write job* for a 352-row frame, vs 0.39 s for the same
rows shipped as ONE Arrow batch via pandas — the JVM then owns the
data and no Python worker ever starts.  On a real cluster the gap is
the same shape: the pickled path schedules Python-worker tasks, the
Arrow path is a driver-local columnar batch parallelized as plain
JVM rows.

:func:`local_df` is the repo-wide helper: rows (tuples or dicts) ->
pandas (object dtype, so ints with Nones don't become floats) ->
Arrow createDataFrame.  Falls back to the classic path if Arrow
conversion rejects the values (exotic nesting), so callers can use it
unconditionally.

``n_slices`` bounds the partition count of the result: the Arrow path
splits the batch across ``defaultParallelism`` slices, which for a
300-row frame schedules 32 near-empty tasks through every downstream
stage (the same trap ``plans/cypher_write._items_df`` documents); a
``coalesce`` (no shuffle) keeps small frames on few tasks.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _struct_type(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):  # pragma: no cover - defensive
        raise TypeError(f"expected struct schema, got {parsed}")
    return parsed


def local_df(
    spark: SparkSession,
    rows: Sequence,
    schema: str | T.StructType,
    n_slices: int | None = None,
) -> DataFrame:
    """A DataFrame over driver-local ``rows`` (tuples or dicts), shipped
    as one Arrow batch instead of pickled Python rows.

    ``n_slices=None`` derives a bound from the row count (1 slice per
    128 rows, capped at 8) — small frames should not fan out into 32
    near-empty tasks.  Pass an explicit value to override, or ``0`` to
    keep the Arrow path's default parallelism (corpus-scale frames).
    """
    struct = _struct_type(schema)
    names = [f.name for f in struct.fields]
    if len(rows) == 0:
        return spark.createDataFrame([], struct)
    if n_slices is None:
        n_slices = max(1, min(8, len(rows) // 128 + 1))

    try:
        import pandas as pd

        first = rows[0]
        if isinstance(first, Mapping):
            cols = {n: [r.get(n) for r in rows] for n in names}
        else:
            cols = {n: [r[i] for r in rows] for i, n in enumerate(names)}
        pdf = pd.DataFrame(
            {n: pd.Series(v, dtype="object") for n, v in cols.items()},
            columns=names,
        )
        df = spark.createDataFrame(pdf, schema=struct)
    except Exception:
        # Arrow conversion declined (exotic value shapes) — classic path
        if isinstance(rows[0], Mapping):
            rows = [tuple(r.get(n) for n in names) for r in rows]
        return spark.createDataFrame(rows, struct)
    if n_slices:
        df = df.coalesce(n_slices)
    return df


def local_df_cols(
    spark: SparkSession,
    cols: Mapping[str, Iterable],
    schema: str | T.StructType,
    n_slices: int | None = None,
) -> DataFrame:
    """Columnar variant: ``cols`` maps column name -> sequence (e.g.
    numpy arrays) — no per-row tuple materialization at all."""
    import pandas as pd

    struct = _struct_type(schema)
    names = [f.name for f in struct.fields]
    pdf = pd.DataFrame({n: pd.Series(cols[n], dtype="object") for n in names}, columns=names)
    if len(pdf) == 0:
        return spark.createDataFrame([], struct)
    if n_slices is None:
        n_slices = max(1, min(8, len(pdf) // 128 + 1))
    df = spark.createDataFrame(pdf, schema=struct)
    if n_slices:
        df = df.coalesce(n_slices)
    return df
