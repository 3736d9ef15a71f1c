"""Every registry query must match its DuckDB oracle at sf0.001 (the
driver repeats this at sf0.01)."""

import pytest

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.oracle import compare, duck_connection

REGISTRY = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = compare(name, df, qd.oracle, con)
    assert res.ok, str(res)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
