"""The openCypher write surface: the reference's five emitted templates
(``neo4j.go:95-127``) executed natively, including an equivalence check
against the direct ``GraphStore.apply_batch`` path for the full batch
sequence (deletes -> node upsert -> stubs -> edges, ``neo4j.go:238-284``).
"""

import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.model import ENTITY_SCHEMA, normalize_entity
from opencypher_datalayer_spark.plans import CypherError, run_cypher_write
from opencypher_datalayer_spark.store import GraphStore

NS = "http://data.sample.org"

# the reference's templates, verbatim shapes (neo4j.go:95-127)
DELETE_TMPL = "UNWIND $items AS item MATCH (n {gid: item.gid}) DETACH DELETE n"
UPSERT_TMPL = (
    "UNWIND $items AS item MERGE (n {gid: item.gid}) "
    "WITH n, item OPTIONAL MATCH (n)-[r]->() DELETE r "
    "SET n:%s SET n = item"
)
STUB_TMPL = "UNWIND $items AS item MERGE (n {gid: item.gid})"
EDGE_TMPL = (
    "UNWIND $items AS item "
    "MATCH (n1 {gid: item.from}) MATCH (n2 {gid: item.to}) "
    "MERGE (n1)-[r:%s]->(n2) SET r.source = item.source SET r.type = item.type"
)
WIPE_TMPL = "MATCH (n:%s {source: \"%s\"}) DETACH DELETE n"


def nmap(store):
    return {r["gid"]: r.asDict() for r in store.nodes.collect()}


def eset(store):
    return {(r["src"], r["rel_type"], r["dst"], r["source"]) for r in store.edges.collect()}


def upsert_people(store, people):
    items = [
        {"gid": p["gid"], "source": "people", **{k: v for k, v in p.items() if k != "gid"}}
        for p in people
    ]
    return run_cypher_write(store, UPSERT_TMPL % "Person", {"items": items})


def test_node_upsert_template(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(
        store, [{"gid": f"{NS}/things/1", "name": "brian", "age": "23"}]
    )
    nodes = nmap(store)
    assert set(nodes) == {f"{NS}/things/1"}
    n = nodes[f"{NS}/things/1"]
    assert n["label"] == "Person"
    assert n["source"] == "people"
    assert n["props"] == {"name": "brian", "age": "23"}


def test_upsert_replaces_props_and_clears_outgoing_edges(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(store, [{"gid": f"{NS}/p/1", "name": "brian", "age": "23"}])
    store = run_cypher_write(store, STUB_TMPL, {"items": [{"gid": f"{NS}/c/mimiro"}]})
    store = run_cypher_write(
        store,
        EDGE_TMPL % "worksfor",
        {"items": [{"from": f"{NS}/p/1", "to": f"{NS}/c/mimiro", "source": "people"}]},
    )
    assert eset(store) == {(f"{NS}/p/1", "worksfor", f"{NS}/c/mimiro", "people")}

    # re-upsert with new props: wholesale replace + outgoing edge clear
    # (layer_test.go:217-231 semantics)
    store = upsert_people(store, [{"gid": f"{NS}/p/1", "name": "John Doe"}])
    n = nmap(store)[f"{NS}/p/1"]
    assert n["props"] == {"name": "John Doe"}  # age gone — replace, not patch
    assert eset(store) == set()  # outgoing edges cleared


def test_upsert_last_item_wins_within_batch(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(
        store,
        [
            {"gid": f"{NS}/p/1", "name": "first"},
            {"gid": f"{NS}/p/1", "name": "second"},
        ],
    )
    assert nmap(store)[f"{NS}/p/1"]["props"] == {"name": "second"}


def test_stub_merge_leaves_existing_untouched(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(store, [{"gid": f"{NS}/p/1", "name": "brian"}])
    store = run_cypher_write(
        store, STUB_TMPL, {"items": [{"gid": f"{NS}/p/1"}, {"gid": f"{NS}/c/new"}]}
    )
    nodes = nmap(store)
    assert nodes[f"{NS}/p/1"]["props"] == {"name": "brian"}  # untouched
    stub = nodes[f"{NS}/c/new"]
    assert stub["label"] is None and stub["source"] is None and stub["props"] == {}


def test_edge_merge_drops_missing_endpoints_and_dedups(spark):
    store = GraphStore.empty(spark)
    store = run_cypher_write(
        store, STUB_TMPL, {"items": [{"gid": "a"}, {"gid": "b"}]}
    )
    store = run_cypher_write(
        store,
        EDGE_TMPL % "knows",
        {
            "items": [
                {"from": "a", "to": "b", "source": "s"},
                {"from": "a", "to": "b", "source": "s"},  # duplicate -> one edge
                {"from": "a", "to": "missing", "source": "s"},  # endpoint absent -> dropped
            ]
        },
    )
    assert eset(store) == {("a", "knows", "b", "s")}


def test_tombstone_delete_template(spark):
    store = GraphStore.empty(spark)
    store = run_cypher_write(store, STUB_TMPL, {"items": [{"gid": "a"}, {"gid": "b"}, {"gid": "c"}]})
    store = run_cypher_write(
        store,
        EDGE_TMPL % "knows",
        {"items": [{"from": "a", "to": "b", "source": "s"}, {"from": "c", "to": "a", "source": "s"}]},
    )
    # DETACH DELETE a: node gone, incident edges gone both directions
    store = run_cypher_write(store, DELETE_TMPL, {"items": [{"gid": "a"}]})
    assert set(nmap(store)) == {"b", "c"}
    assert eset(store) == set()


def test_filtered_bulk_delete_inline_and_where(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(store, [{"gid": "p1", "name": "x"}, {"gid": "p2", "name": "y"}])
    items = [{"gid": "c1", "source": "companies", "name": "mimiro"}]
    store = run_cypher_write(
        store, UPSERT_TMPL % "Company", {"items": items}
    )

    # C5 inline-map form
    wiped = run_cypher_write(store, WIPE_TMPL % ("Person", "people"))
    assert set(nmap(wiped)) == {"c1"}

    # R4 WHERE form (layer_test.go:275)
    wiped2 = run_cypher_write(
        store, "MATCH (n:Person) WHERE n.source = 'people' DETACH DELETE n"
    )
    assert set(nmap(wiped2)) == {"c1"}


def test_wipe_keeps_null_label_stubs(spark):
    """A filtered DETACH DELETE must not sweep stub nodes whose label is
    NULL (predicate is NULL there, which means no-match, not match)."""
    store = GraphStore.empty(spark)
    store = upsert_people(store, [{"gid": "p1", "name": "x"}])
    store = run_cypher_write(store, STUB_TMPL, {"items": [{"gid": "c1"}]})
    store = run_cypher_write(
        store, "MATCH (n:Person) WHERE n.source = 'people' DETACH DELETE n"
    )
    assert set(nmap(store)) == {"c1"}


def test_set_single_property_patch(spark):
    store = GraphStore.empty(spark)
    store = upsert_people(store, [{"gid": "p1", "name": "brian", "age": "23"}])
    store = run_cypher_write(
        store,
        "UNWIND $items AS item MATCH (n {gid: item.gid}) SET n.name = item.name",
        {"items": [{"gid": "p1", "name": "doe"}]},
    )
    assert nmap(store)["p1"]["props"] == {"name": "doe", "age": "23"}


def test_template_sequence_equals_apply_batch(spark):
    """Running the reference's per-batch statement sequence through the
    Cypher surface produces the same graph as the direct DataFrame write
    path (``GraphStore.apply_batch``)."""
    entities = [
        {"id": f"{NS}/p/1", "props": {f"{NS}/name": "brian", f"{NS}/age": 23},
         "refs": {f"{NS}/worksfor": f"{NS}/c/mimiro"}},
        {"id": f"{NS}/p/2", "props": {f"{NS}/name": "jane"},
         "refs": {f"{NS}/worksfor": [f"{NS}/c/mimiro", f"{NS}/c/acme"],
                  f"{NS}/knows": f"{NS}/p/1"}},
        {"id": f"{NS}/p/3", "props": {}, "refs": {}, "deleted": True},
    ]

    # direct path
    rows = []
    for i, e in enumerate(entities):
        r = normalize_entity(e)
        r["_seq"] = i
        rows.append(r)
    batch = spark.createDataFrame(rows, ENTITY_SCHEMA)
    direct = GraphStore.empty(spark).apply_batch(batch, label="Person", source="people")

    # cypher template path, reference statement order (neo4j.go:243-279)
    store = GraphStore.empty(spark)
    deletes = [{"gid": e["id"]} for e in entities if e.get("deleted")]
    live = [e for e in entities if not e.get("deleted")]
    node_items = [
        {"gid": e["id"], "source": "people",
         **{k.rsplit("/", 1)[-1]: v for k, v in e["props"].items()}}
        for e in live
    ]
    store = run_cypher_write(store, DELETE_TMPL, {"items": deletes})
    store = run_cypher_write(store, UPSERT_TMPL % "Person", {"items": node_items})
    # stubs + per-rel-type edges (W7/W8 client dataflow feeding C3/C4)
    targets, edge_items_by_rel = set(), {}
    for e in live:
        for ref, tgt in e["refs"].items():
            rel = ref.rsplit("/", 1)[-1]
            tgts = [tgt] if isinstance(tgt, str) else tgt
            for t in tgts:
                targets.add(t)
                edge_items_by_rel.setdefault(rel, []).append(
                    {"from": e["id"], "to": t, "source": "people"}
                )
    store = run_cypher_write(store, STUB_TMPL, {"items": [{"gid": t} for t in sorted(targets)]})
    for rel, items in sorted(edge_items_by_rel.items()):
        store = run_cypher_write(store, EDGE_TMPL % rel, {"items": items})

    assert nmap(store) == nmap(direct)
    assert eset(store) == eset(direct)


def test_write_errors(spark):
    store = GraphStore.empty(spark)
    with pytest.raises(CypherError):
        run_cypher_write(store, "UNWIND $items AS item RETURN item", {"items": []})
    with pytest.raises(CypherError):
        run_cypher_write(store, "MERGE (n {gid: item.gid})")  # no UNWIND binding


# -- round-4 clause surface: CREATE / REMOVE / ON CREATE / ON MATCH ----


def _seed(spark):
    store = GraphStore.empty(spark)
    return upsert_people(
        store, [{"gid": "x:p0", "name": "brian"}, {"gid": "x:p1", "name": "ann"}]
    )


def test_create_node_literal(spark):
    s = run_cypher_write(
        _seed(spark), "CREATE (n:Thing {gid: 'x:c1', kind: 'widget'})"
    )
    n = nmap(s)["x:c1"]
    assert n["label"] == "Thing"
    assert n["props"]["kind"] == "widget"


def test_create_existing_gid_is_upsert(spark):
    """gid is identity here: CREATE on an existing gid updates in place
    (documented divergence from Neo4j's anonymous-identity CREATE)."""
    s = run_cypher_write(_seed(spark), "CREATE (n:Person {gid: 'x:p0', extra: 'e'})")
    assert len([g for g in nmap(s) if g == "x:p0"]) == 1
    assert nmap(s)["x:p0"]["props"]["extra"] == "e"


def test_create_from_unwind_items(spark):
    s = run_cypher_write(
        _seed(spark),
        "UNWIND $items AS item CREATE (n:Thing {gid: item.gid, kind: item.kind})",
        {"items": [{"gid": "x:t1", "kind": "a"}, {"gid": "x:t2", "kind": "b"}]},
    )
    assert nmap(s)["x:t1"]["props"]["kind"] == "a"
    assert nmap(s)["x:t2"]["props"]["kind"] == "b"


def test_merge_on_create_on_match_branches(spark):
    s = run_cypher_write(
        _seed(spark),
        "MERGE (n {gid: 'x:p0'}) ON CREATE SET n.flag = 'new' "
        "ON MATCH SET n.flag = 'seen'",
    )
    assert nmap(s)["x:p0"]["props"]["flag"] == "seen"
    s = run_cypher_write(
        s,
        "MERGE (n {gid: 'x:new'}) ON CREATE SET n.flag = 'new' "
        "ON MATCH SET n.flag = 'seen'",
    )
    assert nmap(s)["x:new"]["props"]["flag"] == "new"
    # existing row untouched by the second statement's ON CREATE
    assert nmap(s)["x:p0"]["props"]["flag"] == "seen"


def test_remove_property_and_label(spark):
    s = run_cypher_write(_seed(spark), "MATCH (n {gid: 'x:p0'}) REMOVE n.name")
    assert "name" not in nmap(s)["x:p0"]["props"]
    assert nmap(s)["x:p1"]["props"]["name"] == "ann"  # others untouched
    s = run_cypher_write(s, "MATCH (n {gid: 'x:p0'}) REMOVE n:Person")
    assert nmap(s)["x:p0"]["label"] is None
    assert "Person" not in (nmap(s)["x:p0"].get("labels") or [])


def test_plain_delete_requires_edge_free(spark):
    s = _seed(spark)  # both endpoints exist, so the edge survives MATCH
    s = run_cypher_write(
        s,
        EDGE_TMPL % "knows",
        {"items": [{"from": "x:p0", "to": "x:p1", "source": "t", "type": None}]},
    )
    with pytest.raises(CypherError):
        run_cypher_write(s, "MATCH (n {gid: 'x:p0'}) DELETE n")
    # an edge-free node deletes without DETACH
    s2 = run_cypher_write(s, "MATCH (n {gid: 'x:p0'}) DETACH DELETE n")
    s3 = run_cypher_write(s2, "MATCH (n {gid: 'x:p1'}) DELETE n")
    assert "x:p1" not in nmap(s3)


def test_merge_edge_reversed_direction(spark):
    # MERGE (a)<-[:T]-(b) stores the edge b -> a (ADVICE r4: the write
    # path must honour EdgePat.direction, not silently reverse)
    items = [{"from": "x:p0", "to": "x:p1"}]
    bind = "UNWIND $items AS item MATCH (a {gid: item.from}) MATCH (b {gid: item.to}) "
    s = run_cypher_write(
        _seed(spark), bind + "MERGE (a)<-[:knows]-(b)", {"items": items}
    )
    assert eset(s) == {("x:p1", "knows", "x:p0", None)}
    # CREATE takes the same path
    s2 = run_cypher_write(
        _seed(spark), bind + "CREATE (a)<-[:likes]-(b)", {"items": items}
    )
    assert eset(s2) == {("x:p1", "likes", "x:p0", None)}
    # undirected relationship writes are ambiguous -> error
    with pytest.raises(CypherError):
        run_cypher_write(
            _seed(spark), bind + "MERGE (a)-[:knows]-(b)", {"items": items}
        )


def test_optional_match_edge_direction_delete(spark):
    # seed edges p0 -> p1 and p1 -> p0 with distinct types
    s = _seed(spark)
    s = run_cypher_write(
        s,
        EDGE_TMPL % "out_t",
        {"items": [{"from": "x:p0", "to": "x:p1", "source": "t", "type": None}]},
    )
    s = run_cypher_write(
        s,
        EDGE_TMPL % "in_t",
        {"items": [{"from": "x:p1", "to": "x:p0", "source": "t", "type": None}]},
    )
    # (n)<-[r]-() binds INCOMING edges of n: deleting r for n=p0 removes
    # only p1 -> p0
    bind = "UNWIND $items AS item MATCH (n {gid: item.gid}) WITH n, item "
    items = [{"gid": "x:p0"}]
    s2 = run_cypher_write(
        s, bind + "OPTIONAL MATCH (n)<-[r]-() DELETE r", {"items": items}
    )
    assert eset(s2) == {("x:p0", "out_t", "x:p1", "t")}
    # (n)-[r]-() binds ALL incident edges
    s3 = run_cypher_write(
        s, bind + "OPTIONAL MATCH (n)-[r]-() DELETE r", {"items": items}
    )
    assert eset(s3) == set()
