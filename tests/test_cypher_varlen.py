"""Variable-length path patterns: per-path row semantics, edge
uniqueness (cycle termination), bounds, and hop counts."""

import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.model import EDGES_SCHEMA, NODES_SCHEMA
from opencypher_datalayer_spark.plans import CypherError, run_cypher
from opencypher_datalayer_spark.store import GraphStore


def _store(spark, edges, labels=None):
    nodes = sorted({e[0] for e in edges} | {e[2] for e in edges})
    labels = labels or {}
    ndf = spark.createDataFrame(
        [(n, labels.get(n, "N"), None, "t", {}) for n in nodes], NODES_SCHEMA
    )
    edf = spark.createDataFrame([(s, r, d, "t") for s, r, d in edges], EDGES_SCHEMA)
    return GraphStore(ndf, edf)


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_chain_hops(spark):
    # a -> b -> c -> d
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c"), ("c", "x", "d")])
    out = run_cypher(
        st,
        "MATCH (p)-[r:x*1..3]->(q) RETURN p.gid AS src, q.gid AS dst, r.hops AS hops "
        "ORDER BY src, dst",
    )
    assert rows(out) == [
        ("a", "b", 1), ("a", "c", 2), ("a", "d", 3),
        ("b", "c", 1), ("b", "d", 2),
        ("c", "d", 1),
    ]


def test_min_bound_and_exact(spark):
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c"), ("c", "x", "d")])
    out = run_cypher(st, "MATCH (p)-[r:x*2..3]->(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h")
    assert sorted(rows(out)) == [("a", "c", 2), ("a", "d", 3), ("b", "d", 2)]
    exact = run_cypher(st, "MATCH (p)-[r:x*2]->(q) RETURN p.gid AS s, q.gid AS d")
    assert sorted(rows(exact)) == [("a", "c"), ("b", "d")]


def test_diamond_counts_paths_not_pairs(spark):
    # two distinct 2-hop paths a->d (via b and via c) => two rows
    st = _store(
        spark, [("a", "x", "b"), ("a", "x", "c"), ("b", "x", "d"), ("c", "x", "d")]
    )
    out = run_cypher(st, "MATCH (p)-[r:x*2..2]->(q) RETURN p.gid AS s, q.gid AS d")
    assert sorted(rows(out)) == [("a", "d"), ("a", "d")]


def test_cycle_terminates_via_edge_uniqueness(spark):
    # a -> b -> a cycle: paths can't reuse an edge, so *1..4 stays finite
    st = _store(spark, [("a", "x", "b"), ("b", "x", "a")])
    out = run_cypher(st, "MATCH (p)-[r:x*1..4]->(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h")
    assert sorted(rows(out)) == [
        ("a", "a", 2), ("a", "b", 1), ("b", "a", 1), ("b", "b", 2),
    ]


def test_varlen_with_label_endpoints_and_agg(spark):
    st = _store(
        spark,
        [("a", "x", "b"), ("b", "x", "c")],
        labels={"a": "Start", "b": "Mid", "c": "End"},
    )
    out = run_cypher(
        st, "MATCH (p:Start)-[r:x*1..2]->(q) RETURN count(*) AS n_paths"
    )
    assert rows(out) == [(2,)]


def test_varlen_under_optional_match(spark):
    """OPTIONAL MATCH with a variable-length pattern: unreachable
    sources keep their row with NULLs."""
    st = _store(
        spark,
        [("a", "x", "b"), ("b", "x", "c"), ("z", "y", "a")],
        labels={"a": "S", "z": "S"},
    )
    out = run_cypher(
        st,
        "MATCH (p:S) OPTIONAL MATCH (p)-[r:x*1..2]->(q) "
        "RETURN p.gid AS src, count(r) AS n_paths ORDER BY src",
    )
    assert rows(out) == [("a", 2), ("z", 0)]


def test_varlen_rejects_bad_range(spark):
    st = _store(spark, [("a", "x", "b")])
    with pytest.raises(CypherError):
        run_cypher(st, "MATCH (p)-[r:x*3..2]->(q) RETURN p.gid AS s")


def test_shortest_path_min_hops(spark):
    # diamond with a long way round: a->b->d (2 hops) and a->c->e->d (3);
    # plus direct a->d (1). shortestPath keeps only the 1-hop row.
    st = _store(
        spark,
        [
            ("a", "x", "b"), ("b", "x", "d"),
            ("a", "x", "c"), ("c", "x", "e"), ("e", "x", "d"),
            ("a", "x", "d"),
        ],
    )
    out = rows(
        run_cypher(
            st,
            "MATCH shortestPath((p {gid: 'a'})-[r:x*1..4]->(q {gid: 'd'})) "
            "RETURN p.gid AS s, q.gid AS d, r.hops AS h",
        )
    )
    assert out == [("a", "d", 1)]


def test_shortest_path_all_pairs_from_source(spark):
    # chain a->b->c plus shortcut a->c: shortest to c is 1
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c"), ("a", "x", "c")])
    out = rows(
        run_cypher(
            st,
            "MATCH shortestPath((p {gid: 'a'})-[r:x*1..3]->(q)) "
            "RETURN q.gid AS d, r.hops AS h ORDER BY d",
        )
    )
    assert out == [("b", 1), ("c", 1)]


def test_all_shortest_paths_keeps_every_min_hop_path(spark):
    # diamond: a->b->d and a->c->d (two 2-hop paths) plus the longer
    # a->e->f->d — allShortestPaths returns BOTH 2-hop rows,
    # shortestPath exactly one
    st = _store(
        spark,
        [
            ("a", "x", "b"), ("b", "x", "d"),
            ("a", "x", "c"), ("c", "x", "d"),
            ("a", "x", "e"), ("e", "x", "f"), ("f", "x", "d"),
        ],
    )
    allp = run_cypher(
        st,
        "MATCH p = allShortestPaths((s {gid: 'a'})-[:x*1..3]->(t {gid: 'd'})) "
        "RETURN length(p) AS h, nodes(p) AS ns ORDER BY ns",
    )
    assert rows(allp) == [(2, ["a", "b", "d"]), (2, ["a", "c", "d"])]
    one = run_cypher(
        st,
        "MATCH shortestPath((s {gid: 'a'})-[r:x*1..3]->(t {gid: 'd'})) "
        "RETURN r.hops AS h",
    )
    assert rows(one) == [(2,)]
    # without a carried path var, cardinality is still one row per path
    allbare = run_cypher(
        st,
        "MATCH allShortestPaths((s {gid: 'a'})-[r:x*1..3]->(t {gid: 'd'})) "
        "RETURN r.hops AS h",
    )
    assert rows(allbare) == [(2,), (2,)]


def test_shortest_path_requires_varlength(spark):
    st = _store(spark, [("a", "x", "b")])
    with pytest.raises(CypherError):
        run_cypher(st, "MATCH shortestPath((p)-[r:x]->(q)) RETURN p.gid AS s")


def test_varlen_reversed_direction(spark):
    # (a)<-[:x*]-(b): walk stored edges backwards from a
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c")])
    out = run_cypher(
        st,
        "MATCH (p)<-[r:x*1..2]-(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
    )
    assert sorted(rows(out)) == [("b", "a", 1), ("c", "a", 2), ("c", "b", 1)]


def test_varlen_undirected(spark):
    # chain a-b-c walked either way per hop; the stored-edge key keeps
    # a<->b from being traversed forward then immediately backward
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c")])
    out = run_cypher(
        st,
        "MATCH (p)-[r:x*1..2]-(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
    )
    assert sorted(rows(out)) == [
        ("a", "b", 1), ("a", "c", 2),
        ("b", "a", 1), ("b", "c", 1),
        ("c", "a", 2), ("c", "b", 1),
    ]


def test_named_path_varlen_functions(spark):
    st = _store(spark, [("a", "x", "b"), ("b", "x", "c")])
    out = run_cypher(
        st,
        "MATCH p = (s)-[:x*1..2]->(t) "
        "RETURN s.gid AS src, length(p) AS len, nodes(p) AS ns, "
        "relationships(p) AS rs ORDER BY src, len",
    )
    got = [(r.src, r.len, r.ns, r.rs) for r in out.collect()]
    assert got == [
        ("a", 1, ["a", "b"], ["x"]),
        ("a", 2, ["a", "b", "c"], ["x", "x"]),
        ("b", 1, ["b", "c"], ["x"]),
    ]


def test_named_path_single_hop_and_shortest(spark):
    st = _store(
        spark,
        [("a", "x", "b"), ("b", "x", "c"), ("a", "x", "c")],
    )
    one = run_cypher(
        st,
        "MATCH p = (s)-[:x]->(t) WHERE s.gid = 'a' "
        "RETURN length(p) AS len, nodes(p) AS ns ORDER BY ns",
    )
    assert [(r.len, r.ns) for r in one.collect()] == [(1, ["a", "b"]), (1, ["a", "c"])]
    sp = run_cypher(
        st,
        "MATCH p = shortestPath((s)-[:x*1..3]->(t)) "
        "WHERE s.gid = 'a' AND t.gid = 'c' RETURN length(p) AS len, nodes(p) AS ns",
    )
    assert [(r.len, r.ns) for r in sp.collect()] == [(1, ["a", "c"])]


def test_named_path_zero_hop(spark):
    st = _store(spark, [("a", "x", "b")])
    out = run_cypher(
        st,
        "MATCH p = (s)-[:x*0..1]->(t) WHERE s.gid = 'a' "
        "RETURN length(p) AS len, nodes(p) AS ns, relationships(p) AS rs ORDER BY len",
    )
    assert [(r.len, r.ns, r.rs) for r in out.collect()] == [
        (0, ["a"], []),
        (1, ["a", "b"], ["x"]),
    ]


def test_path_functions_require_path_binding(spark):
    st = _store(spark, [("a", "x", "b")])
    with pytest.raises(CypherError, match="bound path variable"):
        run_cypher(st, "MATCH (s)-[:x]->(t) RETURN nodes(s) AS ns")


def test_scalar_chain_path_matches_array_path(spark, monkeypatch):
    """r13: vl_max <= _VL_SCALAR_MAX runs the scalar-chain fast path
    (per-hop scalar columns, pairwise uniqueness predicates) — it must
    be row-identical to the general edge-key-array path on an
    adversarial graph: a 2-cycle (edge reuse bait in both
    orientations), BOTH stored orientations of the same node pair
    (distinct edges that an unordered-pair identity would wrongly
    merge), parallel edges of different types, and a self-loop —
    across directed, reversed, undirected, multi-type, and named-path
    queries."""
    from opencypher_datalayer_spark.plans import cypher as cy

    st = _store(
        spark,
        [
            ("a", "x", "b"), ("b", "x", "a"),        # both orientations
            ("b", "x", "c"), ("c", "x", "c"),        # chain + self-loop
            ("a", "y", "b"), ("c", "y", "a"),        # second rel type
        ],
    )
    queries = [
        "MATCH (p)-[r:x*1..4]->(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
        "MATCH (p)<-[r:x*2..3]-(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
        "MATCH (p)-[r:x*1..3]-(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
        "MATCH (p)-[r:x|y*1..3]->(q) RETURN p.gid AS s, q.gid AS d, r.hops AS h",
        "MATCH pp = (p)-[:x|y*1..3]-(q) RETURN p.gid AS s, nodes(pp) AS ns, "
        "relationships(pp) AS rs",
    ]
    for q in queries:
        fast = sorted(rows(run_cypher(st, q)))
        monkeypatch.setattr(cy, "_VL_SCALAR_MAX", 0)
        slow = sorted(rows(run_cypher(st, q)))
        monkeypatch.undo()
        assert fast == slow and fast, q
