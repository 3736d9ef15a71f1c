"""Graph query surface (SURVEY §2-R) exercised at scale over a graph
built from the star schema (``sources.tabular.graph_from_tables``).

Each query drives the engine's graph operators (label scan, expand,
collect, degree); the oracle reconstructs the same answer relationally
from the raw tables — which is exactly what makes the graph layer
testable without a graph database.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.operators.graph_ops import expand, match_nodes, out_degree
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.sources.tabular import NS, graph_from_tables


# -- R1: label scan + property filter ----------------------------------


def g_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (c:Customer) WHERE c.mktsegment = 'BUILDING' RETURN c.gid, c.name"""
    store = graph_from_tables(spark, sf_dir)
    return (
        match_nodes(store, label="Customer", mktsegment="BUILDING")
        .select("gid", F.col("props").getItem("name").alias("name"))
        .orderBy("gid")
    )


G_MATCH_FILTER_SQL = f"""
SELECT '{NS}/customer/' || CAST(c_custkey AS VARCHAR) AS gid, c_name AS name
FROM customer WHERE c_mktsegment = 'BUILDING'
ORDER BY gid
"""


# -- R2+R3: optional expand + collect ----------------------------------


def g_expand_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (c:Customer) OPTIONAL MATCH (c)-[:in_nation]->(m)
    RETURN c.gid, COLLECT(m.gid) — collected list sorted for determinism
    and JSON-serialized (the driver's pandas canonicalizer cannot hash
    raw list cells)."""
    store = graph_from_tables(spark, sf_dir)
    n = match_nodes(store, label="Customer")
    return (
        expand(store, n, rel_type="in_nation", optional=True)
        .groupBy("gid")
        .agg(F.array_sort(F.collect_list("m_gid")).alias("t"))
        .select("gid", F.to_json("t").alias("targets"), F.size("t").alias("n_targets"))
        .orderBy("gid")
    )


G_EXPAND_COLLECT_SQL = f"""
SELECT gid, CAST(to_json(list_sort(list(target))) AS VARCHAR) AS targets,
       COUNT(target) AS n_targets
FROM (
  SELECT '{NS}/customer/' || CAST(c_custkey AS VARCHAR) AS gid,
         '{NS}/nation/' || CAST(c_nationkey AS VARCHAR) AS target
  FROM customer
)
GROUP BY gid
ORDER BY gid
"""


# -- degree over the edge table ----------------------------------------


def g_nation_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree of every Nation node over in_nation edges (customers +
    suppliers pointing at it)."""
    store = graph_from_tables(spark, sf_dir)
    deg = (
        store.edges.where(F.col("rel_type") == "in_nation")
        .groupBy(F.col("dst").alias("gid"))
        .agg(F.count("*").alias("in_degree"))
    )
    nations = match_nodes(store, label="Nation").select(
        "gid", F.col("props").getItem("name").alias("name")
    )
    return nations.join(deg, "gid", "left").na.fill({"in_degree": 0}).orderBy("gid")


G_NATION_IN_DEGREE_SQL = f"""
WITH deg AS (
  SELECT dst AS gid, COUNT(*) AS in_degree FROM (
    SELECT '{NS}/nation/' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
    UNION ALL
    SELECT '{NS}/nation/' || CAST(s_nationkey AS VARCHAR) AS dst FROM supplier
  ) GROUP BY dst
)
SELECT n.gid, n.name, COALESCE(deg.in_degree, 0) AS in_degree
FROM (SELECT '{NS}/nation/' || CAST(n_nationkey AS VARCHAR) AS gid, n_name AS name FROM nation) n
LEFT JOIN deg ON n.gid = deg.gid
ORDER BY n.gid
"""


# -- 2-hop traversal ----------------------------------------------------


def g_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (c:Customer)-[:in_nation]->(:Nation)-[:in_region]->(r:Region)
    RETURN r.name, count(c) — two edge-table self-joins, small side broadcast."""
    store = graph_from_tables(spark, sf_dir)
    hop1 = store.edges.where(F.col("rel_type") == "in_nation").select(
        F.col("src").alias("c_gid"), F.col("dst").alias("n_gid")
    )
    # restrict hop1 sources to Customer nodes (suppliers also have in_nation)
    custs = match_nodes(store, label="Customer").select(F.col("gid").alias("c_gid"))
    hop1 = hop1.join(custs, "c_gid", "left_semi")
    hop2 = store.edges.where(F.col("rel_type") == "in_region").select(
        F.col("src").alias("n_gid"), F.col("dst").alias("r_gid")
    )
    regions = match_nodes(store, label="Region").select(
        F.col("gid").alias("r_gid"), F.col("props").getItem("name").alias("region_name")
    )
    return (
        hop1.join(F.broadcast(hop2), "n_gid")
        .join(F.broadcast(regions), "r_gid")
        .groupBy("region_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("region_name")
    )


G_TWO_HOP_SQL = """
SELECT r_name AS region_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY region_name
"""


# -- 3-hop motif with aggregation --------------------------------------


def g_order_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (o:Order)-[:placed_by]->(c:Customer)-[:in_nation]->(n)-[:in_region]->(r)
    RETURN r.name, count(o) — order volume by region through the graph."""
    store = graph_from_tables(spark, sf_dir)
    placed = store.edges.where(F.col("rel_type") == "placed_by").select(
        F.col("src").alias("o_gid"), F.col("dst").alias("c_gid")
    )
    in_nation = store.edges.where(F.col("rel_type") == "in_nation").select(
        F.col("src").alias("c_gid"), F.col("dst").alias("n_gid")
    )
    # placed_by targets are customers only, so the in_nation join already
    # restricts to customer sources — no label filter needed.
    in_region = store.edges.where(F.col("rel_type") == "in_region").select(
        F.col("src").alias("n_gid"), F.col("dst").alias("r_gid")
    )
    regions = match_nodes(store, label="Region").select(
        F.col("gid").alias("r_gid"), F.col("props").getItem("name").alias("region_name")
    )
    return (
        placed.join(in_nation, "c_gid")
        .join(F.broadcast(in_region), "n_gid")
        .join(F.broadcast(regions), "r_gid")
        .groupBy("region_name")
        .agg(F.count("*").alias("n_orders"), F.countDistinct("c_gid").alias("n_customers"))
        .orderBy("region_name")
    )


G_ORDER_REGION_SQL = """
SELECT r_name AS region_name, COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY region_name
"""


# -- variable-length paths ----------------------------------------------


def cy_varlength_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH (a:Order)-[r:next_order*1..3]->(b) over the per-customer
    order-sequence graph (each order points to the customer's next
    order): path counts per hop length. Exercises the bounded iterative
    expansion (SURVEY §4 — Catalyst has no recursion, so *1..k is a
    driver-composed k-join union). The oracle spells out the 1/2/3-hop
    joins explicitly."""
    from pyspark.sql import Window

    from opencypher_datalayer_spark.plans import run_cypher
    from opencypher_datalayer_spark.store import GraphStore

    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = (
        orders.select(
            F.col("o_orderkey").cast("string").alias("src"),
            F.lead(F.col("o_orderkey")).over(w).cast("string").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .select("src", F.lit("next_order").alias("rel_type"), "dst", F.lit("orders").alias("source"))
    )
    nodes = orders.select(
        F.col("o_orderkey").cast("string").alias("gid"),
        F.lit("Order").alias("label"),
        F.lit("orders").alias("source"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    store = GraphStore(nodes, nxt)
    return run_cypher(
        store,
        "MATCH (a:Order)-[r:next_order*1..3]->(b:Order) "
        "RETURN r.hops AS hops, count(*) AS n_paths ORDER BY hops",
    )


def _order_chain_store(spark: SparkSession, sf_dir: str):
    """Per-customer order-sequence graph: each order points at the
    customer's next order (shared by the var-length/path queries)."""
    from pyspark.sql import Window

    from opencypher_datalayer_spark.store import GraphStore

    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = (
        orders.select(
            F.col("o_orderkey").cast("string").alias("src"),
            F.lead(F.col("o_orderkey")).over(w).cast("string").alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .select("src", F.lit("next_order").alias("rel_type"), "dst", F.lit("orders").alias("source"))
    )
    nodes = orders.select(
        F.col("o_orderkey").cast("string").alias("gid"),
        F.lit("Order").alias("label"),
        F.lit("orders").alias("source"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    return GraphStore(nodes, nxt)


def cy_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH p = (a:Order)-[:next_order*1..2]->(b:Order): named path
    binding with the canonical path idioms — length(p), nodes(p),
    relationships(p) — over the order-sequence graph. nodes(p) is the
    traversal-ordered gid array (JSON-serialized for the driver's
    pandas canonicalizer); the oracle spells the 1/2-hop paths out as
    explicit joins building the same lists."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = _order_chain_store(spark, sf_dir)
    out = run_cypher(
        store,
        "MATCH p = (a:Order)-[:next_order*1..2]->(b:Order) "
        "RETURN a.gid AS src, b.gid AS dst, length(p) AS len, "
        "nodes(p) AS ns, relationships(p) AS rs",
    )
    return (
        out.select(
            "src",
            "dst",
            "len",
            F.to_json("ns").alias("path_nodes"),
            F.size("rs").alias("n_rels"),
        )
        .orderBy("src", "len")
    )


CY_PATH_FUNCTIONS_SQL = """
WITH e AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS src,
         CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst
  FROM orders
  QUALIFY dst IS NOT NULL)
SELECT src, dst, len, CAST(to_json(ns) AS VARCHAR) AS path_nodes, n_rels FROM (
  SELECT src, dst, 1 AS len, [src, dst] AS ns, 1 AS n_rels FROM e
  UNION ALL
  SELECT e1.src, e2.dst, 2, [e1.src, e1.dst, e2.dst], 2
  FROM e e1 JOIN e e2 ON e1.dst = e2.src)
ORDER BY src, len
"""


CY_VARLENGTH_SQL = """
WITH e AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS src,
         CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey) AS VARCHAR) AS dst
  FROM orders
  QUALIFY dst IS NOT NULL)
SELECT hops, COUNT(*) AS n_paths FROM (
  SELECT 1 AS hops FROM e
  UNION ALL
  SELECT 2 FROM e e1 JOIN e e2 ON e1.dst = e2.src
  UNION ALL
  SELECT 3 FROM e e1 JOIN e e2 ON e1.dst = e2.src JOIN e e3 ON e2.dst = e3.src)
GROUP BY hops
ORDER BY hops
"""


# -- write templates end-to-end -----------------------------------------


def cy_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's write templates (``neo4j.go:95-127``) executed
    natively: upsert Region + Nation nodes and in_region edges through
    the Cypher write surface, then read back nations-per-region through
    the Cypher read surface. Item lists are driver-side because the UDA
    protocol is row-oriented (25 + 5 rows here; real syncs arrive in
    batches anyway)."""
    from opencypher_datalayer_spark.plans import run_cypher, run_cypher_write
    from opencypher_datalayer_spark.store import GraphStore

    upsert = (
        "UNWIND $items AS item MERGE (n {gid: item.gid}) "
        "WITH n, item OPTIONAL MATCH (n)-[r]->() DELETE r "
        "SET n:%s SET n = item"
    )
    edge_tmpl = (
        "UNWIND $items AS item "
        "MATCH (n1 {gid: item.from}) MATCH (n2 {gid: item.to}) "
        "MERGE (n1)-[r:in_region]->(n2) SET r.source = item.source SET r.type = item.type"
    )

    nation = load_table(spark, "nation", sf_dir).collect()
    region = load_table(spark, "region", sf_dir).collect()
    # ONE checkpoint, after the two node-upsert statements: the edge
    # statement MATCHes nodes twice, so materializing the node chain
    # once there stops recompute — while a trailing checkpoint before a
    # single read would only add a wasted materialization (measured:
    # mid-chain-only 3.4 s vs mid+trailing 4.8 s vs none 6.0 s warm).
    store = GraphStore.empty(spark)
    store = run_cypher_write(
        store,
        upsert % "Region",
        {"items": [
            {"gid": f"{NS}/region/{r['r_regionkey']}", "source": "tpch", "name": r["r_name"]}
            for r in region
        ]},
    )
    store = run_cypher_write(
        store,
        upsert % "Nation",
        {"items": [
            {"gid": f"{NS}/nation/{n['n_nationkey']}", "source": "tpch", "name": n["n_name"]}
            for n in nation
        ]},
    ).checkpointed()
    store = run_cypher_write(
        store,
        "UNWIND $items AS item MERGE (n {gid: item.gid})",
        {"items": [{"gid": f"{NS}/region/{n['n_regionkey']}"} for n in nation]},
    )
    store = run_cypher_write(
        store,
        edge_tmpl,
        {"items": [
            {"from": f"{NS}/nation/{n['n_nationkey']}",
             "to": f"{NS}/region/{n['n_regionkey']}", "source": "tpch"}
            for n in nation
        ]},
    )
    return run_cypher(
        store,
        "MATCH (n:Nation)-[e:in_region]->(r:Region) "
        "RETURN r.name AS region_name, count(n) AS n_nations ORDER BY region_name",
    )


CY_WRITE_ROUNDTRIP_SQL = """
SELECT r_name AS region_name, COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY region_name
"""


# -- the same queries through the Cypher front-end ----------------------


def cy_match_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 via the openCypher parser/planner (plans.cypher)."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (c:Customer {mktsegment: 'BUILDING'}) "
        "RETURN c.gid AS gid, c.name AS name ORDER BY gid",
    )


def cy_expand_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R2+R3 via the Cypher front-end: OPTIONAL MATCH + COLLECT +
    count with implicit grouping. The collected list is JSON-serialized
    after the Cypher plan so the driver's canonicalizer can hash it."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    df = run_cypher(
        store,
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[r:in_nation]->(m) "
        "RETURN c.gid AS gid, collect(m.gid) AS targets, count(r) AS n_targets "
        "ORDER BY gid",
    )
    return df.select(
        "gid", F.to_json(F.array_sort("targets")).alias("targets"), "n_targets"
    )


def cy_with_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-stage aggregation + filter (Cypher's HAVING) through the
    front-end: nations with at least 40 customers."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (c:Customer)-[r:in_nation]->(n:Nation) "
        "WITH n, count(c) AS n_customers WHERE n_customers >= 40 "
        "RETURN n.name AS nation, n_customers ORDER BY nation",
    )


CY_WITH_HAVING_SQL = """
SELECT n_name AS nation, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) >= 40
ORDER BY nation
"""


def cy_pattern_comprehension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern comprehensions through the front-end: per-nation
    cardinalities via size([...]) over incoming labeled targets plus
    the region name as a (one-element, JSON-serialized) projected list.
    Each comprehension plans as ONE aggregation + left join on the
    nation frame — no per-row subquery (PatternCompr docstring)."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    out = run_cypher(
        store,
        "MATCH (n:Nation) "
        "RETURN n.name AS nation, "
        "size([(n)<-[:in_nation]-(c:Customer) | c.gid]) AS n_customers, "
        "size([(n)<-[:in_nation]-(s:Supplier) | s.gid]) AS n_suppliers, "
        "[(n)-[:in_region]->(r) | r.name] AS region "
        "ORDER BY nation",
    )
    return out.select(
        "nation", "n_customers", "n_suppliers", F.to_json("region").alias("region")
    )


CY_PATTERN_COMPR_SQL = """
SELECT n_name AS nation,
       (SELECT COUNT(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers,
       (SELECT COUNT(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_suppliers,
       CAST(to_json([r_name]) AS VARCHAR) AS region
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY nation
"""


def cy_case_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE bucketing + EXISTS pattern predicate through the front-end:
    French customers by account-balance bracket. EXISTS plans as a
    deduplicated marker semi-join (target label/prop filter pushed into
    the build side); CASE compiles to an F.when chain."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (c:Customer) "
        "WHERE EXISTS { (c)-[:in_nation]->(n:Nation {name: 'NATION_7'}) } "
        "WITH CASE WHEN c.acctbal < 0 THEN 'neg' WHEN c.acctbal < 5000 THEN 'mid' "
        "ELSE 'high' END AS bracket "
        "RETURN bracket, count(*) AS n_customers ORDER BY bracket",
    )


CY_CASE_EXISTS_SQL = """
SELECT bracket, COUNT(*) AS n_customers FROM (
  SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'mid'
              ELSE 'high' END AS bracket
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name = 'NATION_7')
GROUP BY bracket ORDER BY bracket
"""


def cy_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library through the Cypher front-end (0-based
    substring, Cypher-style names)."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (n:Nation) RETURN toupper(n.name) AS upper_name, "
        "tolower(n.name) AS lower_name, substring(n.name, 0, 3) AS prefix3, "
        "length(n.name) AS name_len, replace(n.name, 'a', '_') AS repl "
        "ORDER BY upper_name",
    )


CY_SCALAR_SQL = """
SELECT UPPER(n_name) AS upper_name, LOWER(n_name) AS lower_name,
       SUBSTRING(n_name, 1, 3) AS prefix3, LENGTH(n_name) AS name_len,
       REPLACE(n_name, 'a', '_') AS repl
FROM nation ORDER BY upper_name
"""


def cy_undirected_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected match + relationship-type alternation through the
    front-end: each nation's degree over BOTH edge orientations and
    both rel types (incoming customer/supplier in_nation edges + the
    outgoing in_region edge), with a first-class boolean predicate in
    RETURN."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (n:Nation)-[r:in_nation|in_region]-(x) "
        "RETURN n.name AS nation, count(*) AS degree, "
        "count(*) > 65 AS busy ORDER BY nation",
    )


CY_UNDIRECTED_DEGREE_SQL = """
WITH touch AS (
  SELECT c_nationkey AS k FROM customer
  UNION ALL SELECT s_nationkey FROM supplier
  UNION ALL SELECT n_nationkey FROM nation)
SELECT n_name AS nation, COUNT(*) AS degree, COUNT(*) > 65 AS busy
FROM touch JOIN nation ON k = n_nationkey
GROUP BY n_name ORDER BY nation
"""


def cy_agg_in_func(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates composed under scalar functions via the front-end
    (size(collect(x))), left-direction pattern spelling, and WITH
    DISTINCT — the round-4 surface in one oracled query."""
    from opencypher_datalayer_spark.plans import run_cypher

    store = graph_from_tables(spark, sf_dir)
    return run_cypher(
        store,
        "MATCH (n:Nation)<-[r:in_nation]-(c:Customer) "
        "WITH DISTINCT n, c "
        "RETURN n.name AS nation, size(collect(c.gid)) AS n_customers "
        "ORDER BY nation",
    )


CY_AGG_IN_FUNC_SQL = """
SELECT n_name AS nation, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY nation
"""


QUERIES = {
    "g_match_filter": QueryDef(g_match_filter, G_MATCH_FILTER_SQL, "R1 label scan + filter"),
    "cy_match_filter": QueryDef(
        cy_match_filter, G_MATCH_FILTER_SQL, "R1 through the Cypher parser"
    ),
    "cy_expand_collect": QueryDef(
        cy_expand_collect, G_EXPAND_COLLECT_SQL, "R2+R3 through the Cypher parser"
    ),
    "cy_write_roundtrip": QueryDef(
        cy_write_roundtrip, CY_WRITE_ROUNDTRIP_SQL, "C1-C4 write templates end-to-end"
    ),
    "cy_varlength_chains": QueryDef(
        cy_varlength_chains, CY_VARLENGTH_SQL, "variable-length *1..3 path expansion"
    ),
    "cy_path_functions": QueryDef(
        cy_path_functions,
        CY_PATH_FUNCTIONS_SQL,
        "named path binding: length/nodes/relationships",
    ),
    "cy_with_having": QueryDef(
        cy_with_having, CY_WITH_HAVING_SQL, "WITH aggregate + WHERE (HAVING) via front-end"
    ),
    "cy_scalar_functions": QueryDef(
        cy_scalar_functions, CY_SCALAR_SQL, "scalar function library via front-end"
    ),
    "cy_case_exists": QueryDef(
        cy_case_exists, CY_CASE_EXISTS_SQL, "CASE buckets + EXISTS semi-join via front-end"
    ),
    "cy_pattern_comprehension": QueryDef(
        cy_pattern_comprehension,
        CY_PATTERN_COMPR_SQL,
        "pattern comprehensions: one aggregation + left join each",
    ),
    "cy_undirected_degree": QueryDef(
        cy_undirected_degree,
        CY_UNDIRECTED_DEGREE_SQL,
        "undirected match + type alternation + predicate value via front-end",
    ),
    "cy_agg_in_func": QueryDef(
        cy_agg_in_func,
        CY_AGG_IN_FUNC_SQL,
        "size(collect()) + left-direction + WITH DISTINCT via front-end",
    ),
    "g_expand_collect": QueryDef(
        g_expand_collect, G_EXPAND_COLLECT_SQL, "R2+R3 optional expand + collect"
    ),
    "g_nation_in_degree": QueryDef(
        g_nation_in_degree, G_NATION_IN_DEGREE_SQL, "in-degree over edges"
    ),
    "g_two_hop": QueryDef(g_two_hop, G_TWO_HOP_SQL, "2-hop traversal + agg"),
    "g_order_region_revenue": QueryDef(
        g_order_region_revenue, G_ORDER_REGION_SQL, "3-hop motif + agg"
    ),
}
