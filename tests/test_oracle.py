"""Every registry query must match its DuckDB oracle at sf0.001 (the
driver repeats this at sf0.01)."""

import pytest

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.oracle import compare, duck_connection

REGISTRY = all_queries(extended=True)


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


def test_primary_registry_fits_driver_window():
    """The driver checks a bounded window of registry entries (50 in
    round 1); the primary tier must fit inside it with every operator
    family present, and extended entries must name a primary cover."""
    from opencypher_datalayer_spark.benchqueries import EXTENDED

    primary = all_queries()
    assert len(primary) <= 50
    assert not set(EXTENDED) & set(primary)
    # every extended query's covering entry is itself primary
    assert set(EXTENDED.values()) <= set(primary)
    # extended tier is a strict superset check
    assert set(primary) | set(EXTENDED) == set(REGISTRY)


def test_no_canonicalizer_hazards_in_output_schemas(spark, sf_dir):
    """No final projection may emit DECIMAL or nested types — the
    driver's pandas canonicalizer degrades or crashes on them."""
    from pyspark.sql import types as T

    hazards = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    bad = []
    for name, qd in REGISTRY.items():
        for f in qd.fn(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, hazards):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, bad
