"""Cypher front-end tests: the reference's readback queries (SURVEY §2-R)
plus the extension clauses, executed against an ingested graph."""

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
    for i, (name, age, employer) in enumerate(
        [("brian", 23, "mimiro"), ("ann", 31, "mimiro"), ("joe", 45, "acme"), ("zoe", 19, None)]
    ):
        refs = {f"{NS}/worksfor": f"{NS}/things/{employer}"} if employer else {}
        w.write(
            {
                "id": f"{NS}/things/p{i}",
                "props": {f"{NS}/name": name, f"{NS}/age": age},
                "refs": refs,
            }
        )
    w.close()
    wc = layer.dataset("companies").incremental()
    wc.write({"id": f"{NS}/things/mimiro", "props": {f"{NS}/name": "Mimiro"}, "refs": {}})
    wc.close()
    return layer.store


def rows(df):
    return [r.asDict() for r in df.collect()]


def test_label_scan_where(store):
    """R1: MATCH + label + WHERE property filter."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.source = 'people' AND n.age > 25 "
            "RETURN n.name AS name, n.age AS age ORDER BY name",
        )
    )
    assert out == [{"name": "ann", "age": "31"}, {"name": "joe", "age": "45"}]


def test_inline_property_map(store):
    out = rows(run_cypher(store, "MATCH (n:Person {name: 'brian'}) RETURN n.gid AS gid"))
    assert out == [{"gid": f"{NS}/things/p0"}]


def test_expand_inner_match(store):
    """R2 inner: only persons with an employer."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person)-[r:worksfor]->(m) "
            "RETURN n.name AS name, m.gid AS target ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian", "joe"]
    assert out[1]["target"] == f"{NS}/things/mimiro"


def test_optional_expand_collect(store):
    """R1+R2+R3: the reference's canonical readback shape
    (layer_test.go:117) with COLLECT + implicit grouping."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.source = 'people' "
            "OPTIONAL MATCH (n)-[r:worksfor]->(m) "
            "RETURN n.name AS name, collect(m.gid) AS targets, count(r) AS n_rels "
            "ORDER BY name",
        )
    )
    by_name = {r["name"]: r for r in out}
    assert by_name["zoe"]["targets"] == []  # COLLECT skips the null no-match
    assert by_name["zoe"]["n_rels"] == 0
    assert by_name["brian"]["targets"] == [f"{NS}/things/mimiro"]
    assert by_name["brian"]["n_rels"] == 1


def test_where_on_expanded_target(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person)-[:worksfor]->(m:Company) "
            "WHERE m.name = 'Mimiro' RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian"]


def test_two_hop_path(store):
    """Chained pattern through a shared intermediate variable."""
    out = rows(
        run_cypher(
            store,
            "MATCH (a:Person)-[:worksfor]->(m) MATCH (b:Person)-[:worksfor]->(m) "
            "WHERE a.name < b.name "
            "RETURN a.name AS a, b.name AS b ORDER BY a, b",
        )
    )
    assert out == [{"a": "ann", "b": "brian"}]


def test_count_star_grouping(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n) RETURN n.label AS label, count(*) AS n ORDER BY label",
        )
    )
    labels = {r["label"]: r["n"] for r in out}
    assert labels["Person"] == 4
    assert labels["Company"] == 1
    assert labels.get(None, 1) >= 1  # acme stub has no label


def test_distinct_skip_limit(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN DISTINCT n.source AS src",
        )
    )
    assert out == [{"src": "people"}]
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name ORDER BY name SKIP 1 LIMIT 2",
        )
    )
    assert [r["name"] for r in out] == ["brian", "joe"]


def test_is_null_predicate(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n) WHERE n.label IS NULL RETURN n.gid AS gid ORDER BY gid",
        )
    )
    assert out == [{"gid": f"{NS}/things/acme"}]


def test_agg_numeric(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN count(*) AS n, min(n.age) AS min_age, "
            "avg(n.age) AS avg_age",
        )
    )
    assert out[0]["n"] == 4
    assert out[0]["min_age"] == "19"  # min over string-typed props
    assert out[0]["avg_age"] == pytest.approx((23 + 31 + 45 + 19) / 4)


def test_parse_errors(store):
    for bad in [
        "WHERE n.x = 1",  # a query cannot start with WHERE
        "MATCH (n:Person) RETURN m.name",
        "MATCH (n:Person",
        "MATCH (n:Person) WHERE RETURN n",
        "MATCH (a)<-[r]->(b) RETURN 1 AS x",  # double-ended arrow
    ]:
        with pytest.raises(CypherError):
            run_cypher(store, bad).collect()


# -- WITH pipeline stages ----------------------------------------------


def test_with_aggregate_then_filter(store):
    """WITH … WHERE on an aggregate (Cypher's HAVING): employers with
    at least two workers."""
    out = rows(
        run_cypher(
            store,
            "MATCH (p:Person)-[r:worksfor]->(c) "
            "WITH c, count(p) AS n_workers WHERE n_workers >= 2 "
            "RETURN c.gid AS employer, n_workers",
        )
    )
    assert out == [{"employer": f"{NS}/things/mimiro", "n_workers": 2}]


def test_with_projection_then_match(store):
    """Pattern variable carried through WITH into a later MATCH."""
    out = rows(
        run_cypher(
            store,
            "MATCH (p:Person {name: 'brian'}) WITH p "
            "MATCH (p)-[r:worksfor]->(c) RETURN c.name AS employer",
        )
    )
    assert out == [{"employer": "Mimiro"}]


def test_with_scalar_rename_and_order(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (p:Person) WITH p.name AS nm, p.age AS age WHERE age < 32 "
            "RETURN nm, age ORDER BY nm",
        )
    )
    assert out == [
        {"nm": "ann", "age": "31"},
        {"nm": "brian", "age": "23"},
        {"nm": "zoe", "age": "19"},
    ]


def test_with_chained_stages(store):
    """Two WITH stages: aggregate, filter, re-aggregate."""
    out = rows(
        run_cypher(
            store,
            "MATCH (p:Person) OPTIONAL MATCH (p)-[r:worksfor]->(c) "
            "WITH p, count(r) AS n_jobs "
            "WITH n_jobs, count(*) AS n_people "
            "RETURN n_jobs, n_people ORDER BY n_jobs",
        )
    )
    assert out == [{"n_jobs": 0, "n_people": 1}, {"n_jobs": 1, "n_people": 3}]


# -- read-side UNWIND ---------------------------------------------------


def test_unwind_literal_list_lookup(store):
    out = rows(
        run_cypher(
            store,
            f"UNWIND ['{NS}/things/p0', '{NS}/things/p2', '{NS}/things/nope'] AS g "
            "MATCH (n) WHERE n.gid = g RETURN g, n.name AS name ORDER BY g",
        )
    )
    assert out == [
        {"g": f"{NS}/things/p0", "name": "brian"},
        {"g": f"{NS}/things/p2", "name": "joe"},
    ]


def test_unwind_param_items(store):
    out = rows(
        run_cypher(
            store,
            "UNWIND $items AS item MATCH (n) WHERE n.gid = item.gid "
            "RETURN item.tag AS tag, n.name AS name ORDER BY tag",
            params={
                "items": [
                    {"gid": f"{NS}/things/p1", "tag": "first"},
                    {"gid": f"{NS}/things/p3", "tag": "second"},
                ]
            },
        )
    )
    assert out == [
        {"tag": "first", "name": "ann"},
        {"tag": "second", "name": "zoe"},
    ]


def test_unwind_aggregation(store):
    out = rows(
        run_cypher(
            store,
            "UNWIND [1, 2, 2, 3] AS x RETURN count(x) AS n, sum(x) AS total",
        )
    )
    assert out == [{"n": 4, "total": 8.0}]


# -- scalar function library ---------------------------------------------


def test_scalar_functions(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN toupper(n.name) AS un, substring(n.name, 0, 2) AS pre, "
            "length(n.name) AS ln, tointeger(n.age) AS age, "
            "coalesce(n.missing, 'dflt') AS c "
            "ORDER BY un",
        )
    )
    assert out[0] == {"un": "ANN", "pre": "an", "ln": 3, "age": 31, "c": "dflt"}
    assert [r["un"] for r in out] == ["ANN", "BRIAN", "JOE", "ZOE"]


def test_functions_in_where_and_aggregate(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE tointeger(n.age) >= 23 "
            "RETURN count(*) AS n, sum(tointeger(n.age)) AS total",
        )
    )
    assert out == [{"n": 3, "total": 99.0}]


def test_unknown_function_rejected(store):
    with pytest.raises(CypherError):
        run_cypher(store, "MATCH (n:Person) RETURN frobnicate(n.name) AS x")


def test_string_predicates(store):
    """STARTS WITH / ENDS WITH / CONTAINS / =~ (engine extension) map to
    pushdown-friendly startswith/endswith/contains/rlike."""
    q = "MATCH (n:Person) WHERE n.name {pred} RETURN n.name AS name ORDER BY name"
    cases = [
        ("STARTS WITH 'br'", ["brian"]),
        ("ENDS WITH 'e'", ["joe", "zoe"]),
        ("CONTAINS 'o'", ["joe", "zoe"]),
        ("=~ '[bj].*'", ["brian", "joe"]),
        # =~ is a WHOLE-string match: 'o.*' must not hit joe/zoe mid-string
        ("=~ 'o.*'", []),
        ("=~ '.*o.*'", ["joe", "zoe"]),
        ("STARTS WITH 'x'", []),
    ]
    for pred, want in cases:
        out = rows(run_cypher(store, q.format(pred=pred)))
        assert [r["name"] for r in out] == want, pred


def test_in_list_predicate(store):
    # string list
    out = rows(run_cypher(
        store, "MATCH (n:Person) WHERE n.name IN ['ann', 'zoe', 'nope'] "
        "RETURN n.name AS name ORDER BY name"))
    assert [r["name"] for r in out] == ["ann", "zoe"]
    # numeric list: props are stored as strings; IN must compare numerically
    out = rows(run_cypher(
        store, "MATCH (n:Person) WHERE n.age IN [23, 19] RETURN n.name AS name ORDER BY name"))
    assert [r["name"] for r in out] == ["brian", "zoe"]
    # NOT composes
    out = rows(run_cypher(
        store, "MATCH (n:Person) WHERE NOT n.name IN ['ann', 'joe', 'brian', 'zoe'] "
        "RETURN n.name AS name"))
    assert out == []


def test_in_requires_list_literal(store):
    with pytest.raises(CypherError):
        run_cypher(store, "MATCH (n:Person) WHERE n.name IN 'ann' RETURN n.name AS name")


def test_type_and_labels_accessors(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person)-[r]->(m) "
            "RETURN n.name AS name, type(r) AS t, labels(n) AS ls, r.type AS quirk "
            "ORDER BY name",
        )
    )
    assert [r["t"] for r in out] == ["worksfor"] * 3
    assert all(r["ls"] == ["Person"] for r in out)
    # reference quirk: SET r.type = item.type with no 'type' key in the
    # item map is a null SET — the edge property never exists
    assert all(r["quirk"] is None for r in out)


def test_type_labels_argument_validation(store):
    with pytest.raises(CypherError):
        run_cypher(store, "MATCH (n:Person) RETURN type(n) AS t")
    with pytest.raises(CypherError):
        run_cypher(store, "MATCH (n:Person)-[r]->(m) RETURN labels(r) AS l")


def test_keys_properties_exists(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE exists(n.age) "
            "RETURN n.name AS name, keys(n) AS ks, properties(n) AS ps "
            "ORDER BY name LIMIT 1",
        )
    )
    assert out[0]["name"] == "ann"
    assert out[0]["ks"] == ["age", "name"]
    assert out[0]["ps"] == {"name": "ann", "age": "31"}
    # exists() filters out absent properties
    n = rows(run_cypher(store, "MATCH (n:Person) WHERE exists(n.nope) RETURN count(*) AS c"))
    assert n == [{"c": 0}]


def test_optional_match_where_multi_path(store):
    """WHERE over a multi-path OPTIONAL MATCH is part of the match:
    null-extension is all-or-nothing across both paths."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "OPTIONAL MATCH (n)-[r]->(c), (n)-[r2]->(c2) "
            "WHERE c.name = 'Mimiro' AND c2.name = 'Mimiro' "
            "RETURN n.name AS name, c.name AS e1, c2.name AS e2 ORDER BY name",
        )
    )
    # brian + ann work for mimiro (both paths bind to the same edge pair
    # combos); joe works for acme -> predicate fails -> null-extended row
    by_name = {r["name"]: r for r in out}
    assert by_name["ann"]["e1"] == "Mimiro" and by_name["ann"]["e2"] == "Mimiro"
    assert by_name["joe"]["e1"] is None and by_name["joe"]["e2"] is None
    assert by_name["zoe"]["e1"] is None  # no edge at all
    assert set(by_name) == {"ann", "brian", "joe", "zoe"}


def test_optional_match_shared_new_vars(spark):
    """Sibling comma-paths of one OPTIONAL MATCH sharing a NEW variable:
    the shared var resolves as an intra-unit join and the null-extension
    is all-or-nothing — a row matching only the first path comes back
    fully null, never half-matched."""
    layer = DataLayer(
        spark,
        {
            "dataset_definitions": [
                {"name": "staff", "source_config": {"label": "Person", "batch_size": 100}},
                {"name": "firms", "source_config": {"label": "Company", "batch_size": 100}},
                {"name": "cities", "source_config": {"label": "City", "batch_size": 100}},
            ]
        },
    )
    w = layer.dataset("staff").incremental()
    w.write(
        {
            "id": f"{NS}/things/a",
            "props": {f"{NS}/name": "alma"},
            "refs": {f"{NS}/worksfor": f"{NS}/things/c1"},
        }
    )
    w.write(
        {
            "id": f"{NS}/things/b",
            "props": {f"{NS}/name": "bert"},
            "refs": {f"{NS}/worksfor": f"{NS}/things/c2"},
        }
    )
    w.close()
    w = layer.dataset("firms").incremental()
    # c1 is based in Oslo; c2 has no basedin edge
    w.write(
        {
            "id": f"{NS}/things/c1",
            "props": {f"{NS}/name": "C1"},
            "refs": {f"{NS}/basedin": f"{NS}/things/oslo"},
        }
    )
    w.write({"id": f"{NS}/things/c2", "props": {f"{NS}/name": "C2"}, "refs": {}})
    w.close()
    w = layer.dataset("cities").incremental()
    w.write({"id": f"{NS}/things/oslo", "props": {f"{NS}/name": "Oslo"}, "refs": {}})
    w.close()

    q = (
        "MATCH (n:Person) "
        "OPTIONAL MATCH (n)-[:worksfor]->(c), (c)-[:basedin]->(t) "
        "{where}RETURN n.name AS name, c.name AS comp, t.name AS city ORDER BY name"
    )
    # without WHERE: bert's first path matches (c2) but the sibling path
    # does not -> whole pattern null (a per-path left join would have
    # leaked comp='C2')
    out = rows(run_cypher(layer.store, q.format(where="")))
    assert out == [
        {"name": "alma", "comp": "C1", "city": "Oslo"},
        {"name": "bert", "comp": None, "city": None},
    ]
    # with WHERE on the shared-path target: same all-or-nothing rule
    out = rows(run_cypher(layer.store, q.format(where="WHERE t.name = 'Oslo' ")))
    assert out == [
        {"name": "alma", "comp": "C1", "city": "Oslo"},
        {"name": "bert", "comp": None, "city": None},
    ]


def test_case_generic(store):
    """Generic CASE WHEN ... THEN ... ELSE ... END as a return item."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN n.name AS name, "
            "CASE WHEN n.age < 25 THEN 'young' WHEN n.age < 40 THEN 'mid' "
            "ELSE 'senior' END AS bracket ORDER BY name",
        )
    )
    assert out == [
        {"name": "ann", "bracket": "mid"},
        {"name": "brian", "bracket": "young"},
        {"name": "joe", "bracket": "senior"},
        {"name": "zoe", "bracket": "young"},
    ]


def test_case_simple_form_and_null_default(store):
    """Simple CASE operand WHEN value ...; missing ELSE yields NULL."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN n.name AS name, "
            "CASE n.name WHEN 'brian' THEN 'match' END AS hit ORDER BY name",
        )
    )
    assert [r["hit"] for r in out] == [None, "match", None, None]


def test_case_inside_aggregate(store):
    """sum(CASE ...) — the conditional-aggregation idiom."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) "
            "RETURN sum(CASE WHEN n.age < 30 THEN 1 ELSE 0 END) AS n_young",
        )
    )
    assert out == [{"n_young": 2.0}]


def test_case_in_where(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE CASE WHEN n.age > 40 THEN true ELSE false END "
            "RETURN n.name AS name",
        )
    )
    assert out == [{"name": "joe"}]


def test_exists_pattern_predicate(store):
    """EXISTS((n)-[:worksfor]->()) keeps only employed people."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE EXISTS((n)-[:worksfor]->()) "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian", "joe"]


def test_not_exists_pattern(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE NOT EXISTS((n)-[:worksfor]->()) "
            "RETURN n.name AS name",
        )
    )
    assert [r["name"] for r in out] == ["zoe"]


def test_exists_brace_form_with_target_constraint(store):
    """EXISTS { (n)-[:worksfor]->(m:Company) } — target label filter;
    only the stub-upgraded mimiro node carries the Company label."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE EXISTS { (n)-[:worksfor]->(m:Company) } "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian"]


def test_exists_composes_with_and(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE EXISTS((n)-[:worksfor]->()) AND n.age > 25 "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "joe"]


def test_exists_scalar_form_still_works(store):
    """exists(n.prop) (property-existence function) is unchanged."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE exists(n.age) RETURN count(*) AS n",
        )
    )
    assert out == [{"n": 4}]


def test_with_order_limit_topk_stage(store):
    """WITH ... ORDER BY ... LIMIT — mid-pipeline top-k feeding a later
    stage."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WITH n ORDER BY n.age DESC LIMIT 2 "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "joe"]


def test_with_order_skip(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WITH n.name AS name, n.age AS age "
            "ORDER BY age ASC SKIP 1 LIMIT 2 RETURN name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian"]


def test_with_limit_then_where(store):
    """WHERE filters the limited rows (selection before predicate)."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WITH n.name AS name, n.age AS age "
            "ORDER BY age DESC LIMIT 2 WHERE age > 40 RETURN name",
        )
    )
    assert [r["name"] for r in out] == ["joe"]


def test_union_all_keeps_duplicates(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'brian'}) RETURN n.name AS name "
            "UNION ALL MATCH (n:Person) WHERE n.age < 30 RETURN n.name AS name",
        )
    )
    assert sorted(r["name"] for r in out) == ["brian", "brian", "zoe"]


def test_union_set_semantics(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'brian'}) RETURN n.name AS name "
            "UNION MATCH (n:Person) WHERE n.age < 30 RETURN n.name AS name",
        )
    )
    assert sorted(r["name"] for r in out) == ["brian", "zoe"]


def test_union_column_mismatch_raises(store):
    with pytest.raises(CypherError):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name "
            "UNION MATCH (n:Person) RETURN n.age AS age",
        )


def test_union_mixed_flags_raises(store):
    with pytest.raises(CypherError):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name "
            "UNION MATCH (n:Person) RETURN n.name AS name "
            "UNION ALL MATCH (n:Person) RETURN n.name AS name",
        )


def test_union_trailing_order_by_orders_whole_union(store):
    """openCypher: a trailing ORDER BY after UNION orders the combined
    result, not just the final branch (ADVICE r3 #1)."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.age > 40 RETURN n.name AS name "
            "UNION ALL MATCH (n:Person) WHERE n.age < 30 RETURN n.name AS name "
            "ORDER BY name",
        )
    )
    names = [r["name"] for r in out]
    assert names == sorted(names) and set(names) == {"brian", "joe", "zoe"}


def test_union_trailing_limit_applies_to_whole_union(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name "
            "UNION MATCH (n:Company) RETURN n.name AS name "
            "ORDER BY name LIMIT 2",
        )
    )
    assert [r["name"] for r in out] == ["Mimiro", "ann"]


def test_union_order_by_in_nonfinal_branch_raises(store):
    with pytest.raises(CypherError):
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name ORDER BY name "
            "UNION MATCH (n:Company) RETURN n.name AS name",
        )


def test_union_branch_column_order_insensitive(store):
    """Branches returning the same column names in a different order are
    legal (rows combine by name, openCypher requires names not order)."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'zoe'}) RETURN n.name AS a, n.age AS b "
            "UNION MATCH (n:Person {name: 'joe'}) RETURN n.age AS b, n.name AS a",
        )
    )
    assert sorted((r["a"], r["b"]) for r in out) == [("joe", "45"), ("zoe", "19")]


def test_string_concat_plus(store):
    """'+' with a string operand concatenates (openCypher), instead of
    failing in an executor with a numeric cast error (ADVICE r3 #2)."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'zoe'}) "
            "RETURN n.name + '!' AS bang, 'age=' + n.age AS tagged",
        )
    )
    assert out == [{"bang": "zoe!", "tagged": "age=19"}]


def test_numeric_plus_still_numeric(store):
    out = rows(
        run_cypher(store, "MATCH (n:Person {name: 'zoe'}) RETURN n.age + 1 AS a")
    )
    assert out == [{"a": 20.0}]


def test_exists_pattern_param_in_prop_map(store):
    """$param inside an EXISTS pattern's property map resolves
    (ADVICE r3 #3)."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE EXISTS { (n)-[:worksfor]->(m {name: $co}) } "
            "RETURN n.name AS name ORDER BY name",
            params={"co": "Mimiro"},
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian"]


def test_order_by_aggregate_expression(store):
    """ORDER BY count(r) where the RETURN aliases the same aggregate."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person)-[r:worksfor]->(m) "
            "RETURN m.gid AS employer, count(r) AS n_emps "
            "ORDER BY count(r) DESC, employer ASC",
        )
    )
    assert out == [
        {"employer": f"{NS}/things/mimiro", "n_emps": 2},
        {"employer": f"{NS}/things/acme", "n_emps": 1},
    ]


def test_read_query_parameters(store):
    """$params resolve in WHERE, pattern property maps, and RETURN."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.age > $min_age "
            "RETURN n.name AS name, $tag AS tag ORDER BY name",
            params={"min_age": 30, "tag": "senior"},
        )
    )
    assert out == [
        {"name": "ann", "tag": "senior"},
        {"name": "joe", "tag": "senior"},
    ]
    out2 = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: $who}) RETURN n.gid AS gid",
            params={"who": "brian"},
        )
    )
    assert out2 == [{"gid": f"{NS}/things/p0"}]


def test_missing_read_parameter_raises(store):
    with pytest.raises(CypherError):
        run_cypher(store, "MATCH (n:Person) WHERE n.age > $m RETURN n.name AS name")


def test_arithmetic_expressions(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'brian'}) "
            "RETURN n.age + 1 AS next_year, n.age * 2 AS doubled, "
            "n.age - 3 AS past, n.age / 2 AS half, n.age % 10 AS last_digit",
        )
    )
    assert out == [
        {"next_year": 24.0, "doubled": 46.0, "past": 20.0, "half": 11.5, "last_digit": 3.0}
    ]


def test_arithmetic_in_where_and_precedence(store):
    # 19 + 2 * 3 = 25 (mul binds tighter); zoe (19) fails > 25, brian (23) fails,
    # ann 31 and joe 45 pass
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.age > 19 + 2 * 3 "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "joe"]


def test_arithmetic_no_space_negative(store):
    """'n.age -1' tokenizes the signed literal; the parser folds it back
    into a subtraction."""
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'zoe'}) RETURN n.age -1 AS y",
        )
    )
    assert out == [{"y": 18.0}]


def test_arithmetic_with_aggregate(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN count(*) * 10 AS deka",
        )
    )
    assert out == [{"deka": 40.0}]


def test_with_arithmetic_over_aggregate(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person)-[r:worksfor]->(m) "
            "WITH m, count(n) * 100 AS pct_x100 "
            "RETURN m.gid AS employer, pct_x100 ORDER BY employer",
        )
    )
    assert out == [
        {"employer": f"{NS}/things/acme", "pct_x100": 100.0},
        {"employer": f"{NS}/things/mimiro", "pct_x100": 200.0},
    ]


# -- round-4 surface: direction, alternation, operators, standalone ----


def test_left_direction_match(store):
    """(c)<-[r]-(p): the stored edge runs p -> c."""
    out = rows(
        run_cypher(
            store,
            "MATCH (c)<-[r:worksfor]-(p:Person) "
            "RETURN c.gid AS g, p.name AS n ORDER BY n",
        )
    )
    assert [r["n"] for r in out] == ["ann", "brian", "joe"]
    assert out[0]["g"] == f"{NS}/things/mimiro"


def test_undirected_match_counts_both_orientations(store):
    # 3 worksfor edges, each admitting 2 variable bindings
    out = rows(run_cypher(store, "MATCH (a)-[r:worksfor]-(b) RETURN count(*) AS c"))
    assert out == [{"c": 6}]


def test_undirected_self_loop_matches_once(spark):
    """openCypher matches a self-loop relationship once per undirected
    pattern, not twice (ADVICE r4)."""
    layer = DataLayer(spark, CONFIG)
    w = layer.dataset("people").incremental()
    w.write(
        {
            "id": f"{NS}/things/solo",
            "props": {f"{NS}/name": "solo"},
            "refs": {f"{NS}/knows": f"{NS}/things/solo"},
        }
    )
    w.close()
    s = layer.store
    out = rows(run_cypher(s, "MATCH (a)-[r:knows]-(b) RETURN count(*) AS c"))
    assert out == [{"c": 1}]
    # directed still matches once in each explicit direction
    assert rows(run_cypher(s, "MATCH (a)-[r:knows]->(b) RETURN count(*) AS c")) == [
        {"c": 1}
    ]


def test_relationship_type_alternation(store):
    out = rows(
        run_cypher(store, "MATCH (n:Person)-[r:worksfor|knows]->(m) RETURN count(*) AS c")
    )
    assert out == [{"c": 3}]
    # [:A|:B] spelling is equivalent
    out2 = rows(
        run_cypher(store, "MATCH (n:Person)-[r:worksfor|:knows]->(m) RETURN count(*) AS c")
    )
    assert out2 == out


def test_xor_power_unary_minus(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE n.age > 20 XOR n.name = 'zoe' RETURN count(*) AS c",
        )
    )
    assert out == [{"c": 4}]
    assert rows(run_cypher(store, "RETURN 2 ^ 3 AS p")) == [{"p": 8.0}]
    # unary minus binds TIGHTER than ^ (openCypher PowerOfExpression
    # contains UnaryAddOrSubtract): -2 ^ 2 == (-2)^2 == 4
    assert rows(run_cypher(store, "RETURN -2 ^ 2 AS x")) == [{"x": 4.0}]
    out = rows(run_cypher(store, "MATCH (n:Person) RETURN -n.age AS neg ORDER BY neg LIMIT 1"))
    assert out == [{"neg": -45.0}]
    # same with a non-literal operand (ADVICE r4): -n.age ^ 2 = (-age)^2
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name: 'brian'}) RETURN -n.age ^ 2 AS sq",
        )
    )
    assert out == [{"sq": 529.0}]


def test_negative_list_subscripts(store):
    # openCypher counts negatives from the end: xs[-1] last, xs[-2]
    # second-to-last (ADVICE r4: previously off by one / crashed)
    assert rows(run_cypher(store, "RETURN [10,20,30][-1] AS a")) == [{"a": 30}]
    assert rows(run_cypher(store, "RETURN [10,20,30][-2] AS a")) == [{"a": 20}]
    assert rows(run_cypher(store, "RETURN [10,20,30][0] AS a")) == [{"a": 10}]
    assert rows(run_cypher(store, "RETURN [10,20,30][2] AS a")) == [{"a": 30}]


def test_standalone_return_and_with(store):
    assert rows(run_cypher(store, "RETURN 1 + 1 AS two")) == [{"two": 2.0}]
    assert rows(run_cypher(store, "WITH 2 AS x RETURN x * 3 AS y")) == [{"y": 6.0}]
    assert rows(run_cypher(store, "RETURN [1,2,3] AS xs")) == [{"xs": [1, 2, 3]}]
    assert rows(run_cypher(store, "RETURN range(1,3) AS r")) == [{"r": [1, 2, 3]}]
    assert rows(run_cypher(store, "RETURN head([1,2]) AS h, last([1,2]) AS l")) == [
        {"h": 1, "l": 2}
    ]
    assert rows(run_cypher(store, "RETURN [10,20,30][1] AS x")) == [{"x": 20}]
    m = rows(run_cypher(store, "RETURN {a: 1, b: 'x'} AS m"))[0]["m"]
    assert m["a"] == 1 and m["b"] == "x"


def test_with_distinct(store):
    out = rows(
        run_cypher(store, "MATCH (n:Person) WITH DISTINCT n.source AS s RETURN s")
    )
    assert out == [{"s": "people"}]
    # DISTINCT over a passthrough node variable dedups by identity
    out = rows(
        run_cypher(
            store,
            "MATCH (p:Person)-[:worksfor]->(c) WITH DISTINCT c "
            "RETURN c.gid AS gid ORDER BY gid",
        )
    )
    assert [r["gid"] for r in out] == [
        f"{NS}/things/acme", f"{NS}/things/mimiro"
    ]


def test_aggregate_inside_function_and_predicate(store):
    assert rows(
        run_cypher(store, "MATCH (n:Person) RETURN size(collect(n.name)) AS c")
    ) == [{"c": 4}]
    assert rows(
        run_cypher(store, "MATCH (n:Person) RETURN count(*) > 2 AS many")
    ) == [{"many": True}]
    assert rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN CASE WHEN count(*) > 2 THEN 'many' ELSE 'few' END AS c",
        )
    ) == [{"c": "many"}]


def test_predicate_as_return_value(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name, n.age > 21 AS adult "
            "ORDER BY name LIMIT 2",
        )
    )
    assert out == [
        {"name": "ann", "adult": True},
        {"name": "brian", "adult": True},
    ]


def test_id_function(store):
    out = rows(run_cypher(store, "MATCH (n:Person {name:'ann'}) RETURN id(n) AS i"))
    assert out == [{"i": f"{NS}/things/p1"}]


def test_exists_undirected(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (c:Company) WHERE EXISTS { (c)-[:worksfor]-(x) } RETURN count(*) AS c",
        )
    )
    assert out == [{"c": 1}]


# -- round-4 wave 2: list lambdas, dynamic pattern props ---------------


def test_list_predicates(store):
    assert rows(run_cypher(store, "RETURN any(x IN [1,2,3] WHERE x > 2) AS a")) == [
        {"a": True}
    ]
    assert rows(run_cypher(store, "RETURN all(x IN [1,2,3] WHERE x > 1) AS a")) == [
        {"a": False}
    ]
    assert rows(run_cypher(store, "RETURN none(x IN [1,2] WHERE x > 5) AS a")) == [
        {"a": True}
    ]
    assert rows(run_cypher(store, "RETURN single(x IN [1,2,3] WHERE x = 2) AS a")) == [
        {"a": True}
    ]
    # in WHERE position
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WHERE any(x IN ['ann','bob'] WHERE x = n.name) "
            "RETURN count(*) AS c",
        )
    )
    assert out == [{"c": 1}]


def test_list_comprehension_and_reduce(store):
    assert rows(run_cypher(store, "RETURN [x IN [1,2,3] WHERE x > 1] AS xs")) == [
        {"xs": [2, 3]}
    ]
    assert rows(run_cypher(store, "RETURN [x IN [1,2,3] | x * 2] AS xs")) == [
        {"xs": [2.0, 4.0, 6.0]}
    ]
    assert rows(
        run_cypher(store, "RETURN [x IN [1,2,3,4] WHERE x % 2 = 0 | x * 10] AS xs")
    ) == [{"xs": [20.0, 40.0]}]
    assert rows(
        run_cypher(store, "RETURN reduce(s = 0, x IN [1,2,3] | s + x) AS total")
    ) == [{"total": 6.0}]
    with pytest.raises(CypherError):
        run_cypher(store, "RETURN reduce(s = '', x IN ['a'] | s + x) AS cat")


def test_comprehension_over_collect(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN [x IN collect(n.name) | toupper(x)] AS names",
        )
    )
    assert sorted(out[0]["names"]) == ["ANN", "BRIAN", "JOE", "ZOE"]


def test_dynamic_pattern_property(store):
    """Inline map values may reference UNWIND/WITH variables — sugar for
    an equality WHERE (openCypher)."""
    out = rows(
        run_cypher(
            store,
            "UNWIND ['brian','ann'] AS nm MATCH (n:Person {name: nm}) "
            "RETURN n.name AS name ORDER BY name",
        )
    )
    assert [r["name"] for r in out] == ["ann", "brian"]
    # OPTIONAL MATCH keeps the null-extension semantics after the lift
    out = rows(
        run_cypher(
            store,
            "UNWIND ['mimiro','nowhere'] AS t "
            f"OPTIONAL MATCH (c {{gid: '{NS}/things/' + t}}) "
            "RETURN t, c.gid AS g ORDER BY t",
        )
    )
    assert out == [
        {"t": "mimiro", "g": f"{NS}/things/mimiro"},
        {"t": "nowhere", "g": None},
    ]


def test_order_by_alias_expression(store):
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN n.name AS name, n.age AS age "
            "ORDER BY age * -1 LIMIT 1",
        )
    )
    assert out == [{"name": "joe", "age": "45"}]


def test_statistical_aggregates(store):
    # ages: 19, 23, 31, 45
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) RETURN stDev(n.age) AS sd, stDevP(n.age) AS sdp, "
            "percentileCont(n.age, 0.5) AS med, percentileDisc(n.age, 0.5) AS dmed, "
            "percentileDisc(n.age, 1.0) AS mx",
        )
    )[0]
    assert out["sd"] == pytest.approx(11.4746, abs=1e-3)
    assert out["sdp"] == pytest.approx(9.9373, abs=1e-3)
    assert out["med"] == pytest.approx(27.0)
    assert out["dmed"] == 23.0
    assert out["mx"] == 45.0


def test_math_functions(store):
    out = rows(
        run_cypher(
            store,
            "RETURN ceil(1.2) AS c, floor(1.8) AS f, sqrt(9) AS s, sign(-3) AS g",
        )
    )[0]
    assert (out["c"], out["f"], out["s"], out["g"]) == (2, 1, 3.0, -1.0)


def test_lexical_conveniences(store):
    """Comments, trailing semicolon, backtick identifiers, scientific
    notation — the lexical surface every Cypher client emits."""
    assert rows(
        run_cypher(store, "MATCH (n:Person) // inline\nRETURN count(*) AS c")
    ) == [{"c": 4}]
    assert rows(
        run_cypher(store, "MATCH (n:Person) /* block\ncomment */ RETURN count(*) AS c")
    ) == [{"c": 4}]
    assert rows(run_cypher(store, "RETURN 1 AS one;")) == [{"one": 1}]
    assert rows(
        run_cypher(store, "MATCH (n:Person {name:'ann'}) RETURN n.name AS `the name`")
    ) == [{"the name": "ann"}]
    assert rows(run_cypher(store, "RETURN 1.5e3 AS x")) == [{"x": 1500.0}]
    with pytest.raises(CypherError):
        run_cypher(store, "RETURN 1 AS a; RETURN 2 AS b")


def test_star_projections(store):
    out = rows(run_cypher(store, "MATCH (n:Person {name:'ann'}) RETURN *"))
    assert len(out) == 1 and out[0]["n"]["gid"] == f"{NS}/things/p1"
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person) WITH * WHERE n.age > 40 RETURN n.name AS nm",
        )
    )
    assert out == [{"nm": "joe"}]
    out = rows(
        run_cypher(
            store,
            "MATCH (n:Person {name:'ann'}) WITH *, n.age AS age RETURN age",
        )
    )
    assert out == [{"age": "31"}]
    with pytest.raises(CypherError):
        run_cypher(store, "RETURN *")  # nothing bound


def test_unsupported_get_precise_errors(store):
    with pytest.raises(CypherError, match="named path"):
        # multi-relationship named paths are the remaining path gap
        run_cypher(
            store, "MATCH p = (a)-[:worksfor]->(b)-[:worksfor]->(c) RETURN 1 AS x"
        )
    with pytest.raises(CypherError, match="non-deterministic"):
        run_cypher(store, "RETURN timestamp() AS t")


def test_temporal_value_functions(store):
    # datetime()/date() with explicit args are deterministic and map to
    # Spark timestamp/date; zero-arg (now) forms stay rejected
    out = rows(
        run_cypher(
            store, "RETURN datetime('2024-01-01T10:30:00') AS t, date('2024-03-05') AS d"
        )
    )
    assert str(out[0]["t"]) == "2024-01-01 10:30:00"
    assert str(out[0]["d"]) == "2024-03-05"
    # duration arithmetic, both spec forms, calendar-aware month math
    out = rows(
        run_cypher(
            store,
            "RETURN datetime('2024-01-01T10:00:00') + duration('P1DT2H30M') AS a, "
            "date('2024-03-05') - duration({days: 7}) AS b, "
            "datetime('2024-01-31T00:00:00') + duration('P1M') AS c",
        )
    )
    assert str(out[0]["a"]) == "2024-01-02 12:30:00"
    assert str(out[0]["b"]) == "2024-02-27"
    assert str(out[0]["c"]) == "2024-02-29 00:00:00"
    # comparisons against string-stored properties coerce naturally
    with pytest.raises(CypherError, match="mixes calendar"):
        run_cypher(store, "RETURN duration('P1M1D') AS x")
    with pytest.raises(CypherError, match="non-deterministic|without arguments"):
        run_cypher(store, "RETURN datetime() AS t")
    with pytest.raises(CypherError, match="ISO-8601"):
        run_cypher(store, "RETURN duration('bogus') AS x")


def test_temporal_filter_on_event_props(spark):
    layer = DataLayer(spark, CONFIG)
    w = layer.dataset("people").incremental()
    for i, ts in enumerate(
        ["2024-01-01 10:00:00", "2024-02-15 09:30:00", "2024-03-01 00:00:00"]
    ):
        w.write({"id": f"{NS}/ev/{i}", "props": {f"{NS}/ts": ts}, "refs": {}})
    w.close()
    out = rows(
        run_cypher(
            layer.store,
            "MATCH (e:Person) WHERE datetime(e.ts) > datetime('2024-01-15T00:00:00') "
            "AND datetime(e.ts) < datetime('2024-01-15T00:00:00') + duration({days: 45}) "
            "RETURN e.gid AS g ORDER BY g",
        )
    )
    assert [r["g"] for r in out] == [f"{NS}/ev/1"]
