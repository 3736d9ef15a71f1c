"""Self-check harness: run a registry query on Spark AND its DuckDB
oracle, and compare results the way the driver does — row count, column
names, and order-insensitive value equality.

Used by ``tests/test_oracle.py`` and ``scripts/selfcheck.py`` so oracle
mismatches are caught locally before the driver ever runs.
"""

from __future__ import annotations

import datetime
import decimal
import math
from dataclasses import dataclass, field

import duckdb

from pyspark.sql import DataFrame, SparkSession

from opencypher_datalayer_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    """Canonicalize a value for cross-engine comparison."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "b:" + str(v)
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, datetime.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return "t:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return "x:" + bytes(v).hex()
    return "s:" + str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems[:6]:
            msg += f"\n    - {p}"
        return msg


def _pd_cell(v) -> str:
    """Canonicalize one pandas cell: collapse the NA family (None/NaN/NaT/
    pd.NA) to one token and unwrap numpy scalars/arrays to their Python
    equivalents, so dtype-name noise between ``toPandas()`` and DuckDB
    ``.df()`` (int64 vs Int64 vs int) doesn't read as a driver hazard —
    while real hazards (Decimal vs float, list cells) keep their type tag.
    """
    if v is None:
        return "∅"
    try:
        import pandas as pd

        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass  # array-likes: pd.isna returns an array → fall through
    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        v = v.tolist()
    return f"{type(v).__name__}:{v!r}"


def _pandas_rows(pdf) -> list[str]:
    """Canonicalize a pandas frame the way the driver does.

    The driver converts both engines' results to pandas (Spark
    ``toPandas()`` vs DuckDB ``.df()``), sorts columns by name, sorts rows
    by all columns, and hashes cell values. That path is TYPE-sensitive:
    a ``Decimal`` cell and the float64 DuckDB degrades it to hash
    differently even when equal, and list cells crash ``sort_values``.
    Reproducing it here catches those hazards before the driver runs.
    """
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    pdf.sort_values(by=cols)  # raises TypeError on unhashable cells, like the driver
    return sorted(
        "|".join(_pd_cell(v) for v in tup)
        for tup in pdf.itertuples(index=False, name=None)
    )


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    res = CompareResult(name=name, ok=True)

    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle_sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    res.spark_rows = len(spark_rows)
    res.oracle_rows = len(duck_rows)

    if sorted(spark_cols) != sorted(duck_cols):
        res.ok = False
        res.problems.append(f"columns differ: spark={spark_cols} oracle={duck_cols}")
        return res
    if len(spark_rows) != len(duck_rows):
        res.ok = False
        res.problems.append("row count mismatch")

    # order-insensitive: canonicalize each row with columns sorted by name
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_set = sorted("|".join(_canon(r[i]) for i in s_order) for r in spark_rows)
    d_set = sorted("|".join(_canon(r[i]) for i in d_order) for r in duck_rows)
    if s_set != d_set:
        res.ok = False
        diffs = 0
        for a, b in zip(s_set, d_set):
            if a != b:
                res.problems.append(f"spark  {a[:220]}")
                res.problems.append(f"oracle {b[:220]}")
                diffs += 1
                if diffs >= 2:
                    break
        if not res.problems:
            res.problems.append("row multiset mismatch (length)")

    # driver-faithful pandas path (catches Decimal/HUGEINT/list hazards
    # that the type-faithful comparison above cannot see)
    try:
        sp_rows = _pandas_rows(spark_df.toPandas())
        dp_rows = _pandas_rows(con.sql(oracle_sql).df())
    except TypeError as e:
        res.ok = False
        res.problems.append(f"pandas canonicalization crash (driver 'err'): {e}")
        return res
    if sp_rows != dp_rows:
        res.ok = False
        for a, b in zip(sp_rows, dp_rows):
            if a != b:
                res.problems.append(f"pandas-path spark  {a[:220]}")
                res.problems.append(f"pandas-path oracle {b[:220]}")
                break
        else:
            res.problems.append("pandas-path row multiset mismatch (length)")
    return res


def run_all(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[CompareResult]:
    from opencypher_datalayer_spark.benchqueries import all_queries

    con = duck_connection(sf_dir)
    results = []
    for name, qd in all_queries(extended=True).items():
        if only and name not in only:
            continue
        try:
            df = qd.fn(spark, sf_dir)
            if qd.oracle is None:
                n = df.count()
                results.append(
                    CompareResult(name=name, ok=n >= 0, spark_rows=n, oracle_rows=-1)
                )
            else:
                results.append(compare(name, df, qd.oracle, con))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(
                CompareResult(name=name, ok=False, problems=[f"EXCEPTION: {e}"][:1])
            )
    return results
