"""Pattern comprehensions: [(n)-[:T]->(m) WHERE pred | expr] planned as
one aggregation + one left join (never a per-row subquery). Engine
semantics: list sorted ascending, NULL projections dropped — see
PatternCompr docstring."""

import pytest

from opencypher_datalayer_spark.ingest import DataLayer
from opencypher_datalayer_spark.plans import CypherError, run_cypher

NS = "http://data.sample.org"

CONFIG = {
    "dataset_definitions": [
        {"name": "people", "source_config": {"label": "Person", "batch_size": 100}},
        {"name": "companies", "source_config": {"label": "Company", "batch_size": 100}},
    ]
}


@pytest.fixture(scope="module")
def store(spark):
    layer = DataLayer(spark, CONFIG)
    w = layer.dataset("people").incremental()
    for i, (name, age, employers) in enumerate(
        [
            ("brian", 23, ["mimiro"]),
            ("ann", 31, ["mimiro", "acme"]),
            ("joe", 45, ["acme"]),
            ("zoe", 19, []),
        ]
    ):
        refs = {f"{NS}/worksfor": [f"{NS}/things/{e}" for e in employers]} if employers else {}
        w.write(
            {
                "id": f"{NS}/things/p{i}",
                "props": {f"{NS}/name": name, f"{NS}/age": age},
                "refs": refs,
            }
        )
    w.close()
    wc = layer.dataset("companies").incremental()
    for cname in ("mimiro", "acme"):
        wc.write(
            {
                "id": f"{NS}/things/{cname}",
                "props": {f"{NS}/name": cname.title()},
                "refs": {},
            }
        )
    wc.close()
    return layer.store


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_return_comprehension_with_empty(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN n.name AS nm, [(n)-[:worksfor]->(c) | c.name] AS emp "
            "ORDER BY nm",
        )
    )
    assert out == [
        ("ann", ["Acme", "Mimiro"]),
        ("brian", ["Mimiro"]),
        ("joe", ["Acme"]),
        ("zoe", []),  # no match -> empty list, not NULL
    ]


def test_comprehension_inner_where_and_size(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN n.name AS nm, "
            "size([(n)-[:worksfor]->(c) WHERE c.name STARTS WITH 'M' | c.gid]) AS n_m "
            "ORDER BY nm",
        )
    )
    assert out == [("ann", 1), ("brian", 1), ("joe", 0), ("zoe", 0)]


def test_comprehension_incoming_direction(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (c:Company) "
            "RETURN c.name AS cn, [(c)<-[:worksfor]-(p) | p.name] AS staff "
            "ORDER BY cn",
        )
    )
    assert out == [("Acme", ["ann", "joe"]), ("Mimiro", ["ann", "brian"])]


def test_comprehension_in_where(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "WHERE size([(n)-[:worksfor]->(c) | c.gid]) > 1 "
            "RETURN n.name AS nm",
        )
    )
    assert out == [("ann",)]


def test_comprehension_in_with_stage(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "WITH n.name AS nm, [(n)-[:worksfor]->(c) | c.name] AS emp "
            "WHERE size(emp) > 0 "
            "RETURN nm, emp ORDER BY nm",
        )
    )
    assert out == [
        ("ann", ["Acme", "Mimiro"]),
        ("brian", ["Mimiro"]),
        ("joe", ["Acme"]),
    ]


def test_comprehension_relationship_var(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.name = 'ann' "
            "RETURN [(n)-[r:worksfor]->(c) | type(r)] AS kinds",
        )
    )
    assert out == [(["worksfor", "worksfor"],)]


def test_same_comprehension_binds_once(store):
    # RETURN + ORDER BY reuse one bound column (no second join)
    df = run_cypher(
        store,
        "MATCH (n:Person) "
        "RETURN n.name AS nm, size([(n)-[:worksfor]->(c) | c.gid]) AS k "
        "ORDER BY k DESC, nm",
    )
    assert rows(df) == [("ann", 2), ("brian", 1), ("joe", 1), ("zoe", 0)]


def test_comprehension_errors(store):
    with pytest.raises(CypherError, match="var-length"):
        run_cypher(store, "MATCH (n:Person) RETURN [(n)-[:worksfor*1..2]->(c) | c.gid] AS x")
    with pytest.raises(CypherError, match="bound node variable"):
        run_cypher(store, "MATCH (n:Person) RETURN [(m)-[:worksfor]->(c) | c.gid] AS x")
    with pytest.raises(CypherError, match="nested pattern comprehension"):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN [(n)-[:worksfor]->(c) | [(c)<-[:worksfor]-(p) | p.gid]] AS x",
        )
    with pytest.raises(CypherError, match="single-hop"):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN [(n)-[:worksfor]->(c)-[:worksfor]->(d) | d.gid] AS x",
        )


def test_map_projection(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.name = 'ann' "
            "RETURN n {.name, .age, double_age: n.age * 2} AS m",
        )
    )
    assert len(out) == 1
    m = out[0][0].asDict()
    assert m == {"name": "ann", "age": "31", "double_age": 62.0}


def test_map_projection_with_bound_var(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WITH n, size([(n)-[:worksfor]->(c) | c.gid]) AS k "
            "WHERE n.name = 'ann' RETURN n {.name, k} AS m",
        )
    )
    assert out[0][0].asDict() == {"name": "ann", "k": 2}


def test_map_projection_star(store):
    # bare .*: the full dynamic props map
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.name = 'ann' RETURN n {.*} AS m",
        )
    )
    assert out[0][0] == {"name": "ann", "age": "31"}
    # .* with overrides: override replaces, addition merges; values are
    # strings in the merged map (documented engine deviation)
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.name = 'ann' "
            "RETURN n {.*, age: n.age * 2, tag: 'x'} AS m",
        )
    )
    assert out[0][0] == {"name": "ann", "age": "62.0", "tag": "x"}


def test_map_projection_star_rejected_post_aggregation(store):
    """ADVICE r6 #4: n {.*} inside an aggregating RETURN reads the
    row-bound props column, which no longer exists after the groupBy —
    it must raise the precise post-aggregation CypherError, not a raw
    Spark AnalysisException on a missing n__props column."""
    with pytest.raises(CypherError, match="over aggregates"):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n {.*, c: count(*)} AS m",
        )


def test_map_projection_star_as_grouping_key(store):
    """n {.*} WITHOUT an embedded aggregate is a grouping key next to an
    aggregate — that stays supported."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.name = 'ann' "
            "RETURN n {.*} AS m, count(*) AS c",
        )
    )
    assert out[0][0] == {"name": "ann", "age": "31"} and out[0][1] == 1


def test_map_projection_star_non_node(store):
    with pytest.raises(CypherError, match="requires a node variable"):
        run_cypher(
            store,
            "MATCH (n:Person) WITH n.name AS nm RETURN nm {.*} AS m",
        )


def test_param_inside_pattern_comprehension(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN n.name AS nm, "
            "[(n)-[:worksfor]->(c) WHERE c.name = $co | c.gid] AS hits "
            "ORDER BY nm",
            params={"co": "Acme"},
        )
    )
    assert [(nm, len(h)) for nm, h in out] == [
        ("ann", 1), ("brian", 0), ("joe", 1), ("zoe", 0),
    ]


def test_comprehension_in_with_order_by(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "WITH n ORDER BY size([(n)-[:worksfor]->(c) | c.gid]) DESC, n.name "
            "RETURN n.name AS nm LIMIT 2",
        )
    )
    assert out == [("ann",), ("brian",)]


def test_list_literal_parenthesized_first_element(store):
    out = rows(run_cypher(store, "RETURN [(1), 2] AS xs"))
    assert out == [([1, 2],)]


def test_comprehension_outer_var_precise_error(store):
    with pytest.raises(CypherError, match="undefined variable 'm'"):
        run_cypher(
            store,
            "MATCH (n:Person), (m:Person) "
            "RETURN [(n)-[:worksfor]->(c) WHERE c.name = m.name | c.gid] AS xs",
        )
