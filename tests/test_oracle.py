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
    # canonicalizer-hazard audit on the frame already built for the
    # value check: no final projection may emit DECIMAL or nested types
    # (the driver's pandas canonicalizer degrades or crashes on them) —
    # folded in here so the eager streaming queries are not re-run by a
    # second full pass over the registry just to read their schemas
    from pyspark.sql import types as T

    hazards = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)
    bad = [
        f"{name}.{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, hazards)
    ]
    assert not bad, bad
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


# (the canonicalizer-hazard audit lives inside test_query_matches_oracle
# — one pass over the registry instead of two; the eager streaming
# queries cost ~2 min to re-run just for their schemas)
