"""Threshold-exactness of the set-similarity skip/filter gates
(ADVICE r6 #1): the staged-verify skip and the AllPairs candidate
filter must never be stricter than the final rounded emit predicate.
The old float form ``ceil(t/(1+t)*s)`` overshoots by 1 whenever
s % 9 == 0 (0.8/1.8 > 4/9 in IEEE double), silently dropping pairs
with Jaccard exactly 0.8 that the DuckDB oracle emits; likewise
``ceil(t*na)`` for containment when na % 5 == 0. These tests sweep the
exact-threshold boundary integers through the production gate
expressions."""

from fractions import Fraction

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import dedup


def _eval_gate(spark, rows, gate_col):
    df = spark.createDataFrame(rows, "bound int, s int")
    return [
        r.ok
        for r in df.select(gate_col.alias("ok")).collect()
    ]


def test_jaccard_gate_admits_threshold_exact_pairs(spark):
    """bound = t/(1+t)*s exactly (s divisible by 9, t=0.8 → bound=4s/9):
    jaccard would be exactly 0.8, the emit predicate passes, so the
    gate MUST pass. The old float-ceil alpha rejected every one."""
    t = dedup.JACCARD_T
    fr = Fraction(str(t)) / (1 + Fraction(str(t)))  # 4/9
    rows = [
        (int(fr * s), s)
        for s in range(fr.denominator, 4500, fr.denominator)
    ]
    oks = _eval_gate(
        spark, rows, dedup._jaccard_feasible(F.col("bound"), F.col("s"), t)
    )
    assert all(oks), f"{oks.count(False)} threshold-exact pairs rejected"


def test_jaccard_gate_never_stricter_than_emit(spark):
    """For every (i, s) grid point, emit(i) implies gate(i): the gate is
    literally the emit predicate, but pin it against drift."""
    t = dedup.JACCARD_T
    rows = [(i, s) for s in range(2, 120) for i in range(1, s // 2 + 1)]
    df = spark.createDataFrame(rows, "bound int, s int")
    gate = dedup._jaccard_feasible(F.col("bound"), F.col("s"), t)
    emit = F.round(F.col("bound") / (F.col("s") - F.col("bound")), 6) >= F.lit(t)
    bad = df.where(emit & ~gate).count()
    assert bad == 0


def test_containment_gate_admits_threshold_exact_pairs(spark):
    """bound = t*na exactly (na divisible by 5): containment exactly
    0.8 must pass the skip gate. Old ceil(0.8*na) gave 4na/5+1."""
    t = dedup.CONTAIN_T
    fr = Fraction(str(t))  # 4/5
    rows = [
        (int(fr * na), na)
        for na in range(fr.denominator, 2500, fr.denominator)
    ]
    oks = _eval_gate(
        spark, rows, dedup._containment_feasible(F.col("bound"), F.col("s"), t)
    )
    assert all(oks), f"{oks.count(False)} threshold-exact pairs rejected"


def test_ngram_jaccard_sf0001_matches_duckdb_oracle(spark):
    """End-to-end guard at the smallest SF: staged-verify output equals
    the naive DuckDB oracle bit-for-bit (rows and rounded values)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.dedup_ngram_jaccard(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        (a, b, j) for a, b, j in con.execute(dedup.DEDUP_NGRAM_SQL).fetchall()
    )
    assert got == want and got
