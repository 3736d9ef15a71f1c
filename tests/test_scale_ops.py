"""Scale-technique operators: result equivalence + the plan shapes that
make them worth using."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.scale import write_bucketed


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/bdemo'")
    try:
        a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
        write_bucketed(a, "bdemo.ta", "k", n_buckets=8)
        write_bucketed(b, "bdemo.tb", "k", n_buckets=8)

        # merge hint pins SortMergeJoin on both plans so the comparison
        # isolates the exchange (tiny test tables would broadcast)
        joined = spark.table("bdemo.ta").hint("merge").join(spark.table("bdemo.tb"), "k")
        plan = explain_str(joined)
        assert "Exchange" not in plan  # co-located buckets: shuffle-free
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000

        # the same join on unbucketed frames DOES shuffle — the contrast
        # that justifies the write-time bucketing cost
        plain = a.hint("merge").join(b, "k")
        assert "Exchange" in explain_str(plain)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bdemo CASCADE")
