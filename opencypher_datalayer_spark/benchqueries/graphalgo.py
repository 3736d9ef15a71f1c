"""Graph-analytics registry queries — the GraphX-role coverage
(triangle counting, PageRank) over graphs projected from the star
schema, with FULL value-level DuckDB oracles.

PageRank is oracle-checkable because the operator runs in integer
fixed-point (``operators.graph_algorithms``): the oracle unrolls the
same recurrence as one generated CTE per iteration — bit-identical
ranks, no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.benchqueries.memo import (
    register_memo_cache,
    table_fingerprint,
)
from opencypher_datalayer_spark.operators.graph_algorithms import (
    PR_DAMPING_DEN,
    PR_DAMPING_NUM,
    PR_SCALE,
    bfs_distances,
    label_propagation,
    pagerank_fixedpoint,
    triangle_count,
)
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.sources.tabular import NS, graph_from_tables

# supplier pair must share >= 5 orders: sparsifies the near-complete
# projection at sf0.1 (214k -> 48k edges) while sf0.01's 100-supplier
# graph stays a clique — both regimes exercised
CO_SUPPLY_SUPPORT = 5
PR_ITER = 5


# -- triangle count over the co-supply graph ----------------------------


def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the supplier co-supply graph (suppliers linked when
    they share >= {CO_SUPPLY_SUPPORT} orders — the support threshold
    sparsifies an otherwise near-complete projection)."""
    return triangle_count(_co_supply_edges(spark, sf_dir))


G_TRIANGLES_SQL = f"""
WITH pairs AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
e AS (
  SELECT a.s AS x, b.s AS y
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
  GROUP BY a.s, b.s
  HAVING COUNT(*) >= {CO_SUPPLY_SUPPORT})
SELECT COUNT(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.x = e1.x AND e1.y < e2.y
JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y
"""


# -- PageRank over the property graph -----------------------------------


def g_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{PR_ITER}-iteration fixed-point PageRank over the full projected
    property graph (orders -> customers -> nations -> regions,
    suppliers -> nations)."""
    store = graph_from_tables(spark, sf_dir)
    ranks = pagerank_fixedpoint(store.edges, n_iter=PR_ITER)
    return ranks.orderBy("id")


def _pagerank_oracle_sql(n_iter: int) -> str:
    teleport = (PR_DAMPING_DEN - PR_DAMPING_NUM) * PR_SCALE // PR_DAMPING_DEN
    ctes = [
        f"""edges AS (
  SELECT '{NS}/order/' || CAST(o_orderkey AS VARCHAR) AS u,
         '{NS}/customer/' || CAST(o_custkey AS VARCHAR) AS v FROM orders
  UNION ALL
  SELECT '{NS}/customer/' || CAST(c_custkey AS VARCHAR),
         '{NS}/nation/' || CAST(c_nationkey AS VARCHAR) FROM customer
  UNION ALL
  SELECT '{NS}/supplier/' || CAST(s_suppkey AS VARCHAR),
         '{NS}/nation/' || CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT '{NS}/nation/' || CAST(n_nationkey AS VARCHAR),
         '{NS}/region/' || CAST(n_regionkey AS VARCHAR) FROM nation)""",
        "verts AS (SELECT DISTINCT id FROM (SELECT u AS id FROM edges UNION ALL SELECT v FROM edges))",
        "odeg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u)",
        "ed AS (SELECT e.u, e.v, d.deg FROM edges e JOIN odeg d ON e.u = d.u)",
        f"r0 AS (SELECT id, CAST({PR_SCALE} AS BIGINT) AS rank FROM verts)",
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""r{i} AS (
  SELECT v.id,
         CAST({teleport} AS BIGINT)
           + (COALESCE(c.contribs, 0) * {PR_DAMPING_NUM}) // {PR_DAMPING_DEN} AS rank
  FROM verts v LEFT JOIN (
    SELECT e.v AS id, SUM(r.rank // e.deg) AS contribs
    FROM ed e JOIN r{i - 1} r ON e.u = r.id
    GROUP BY e.v) c ON v.id = c.id)"""
        )
    # CAST: DuckDB's SUM(BIGINT)+// chain yields HUGEINT, which pandas
    # degrades to float64 in the driver's canonicalizer; Spark keeps int64.
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, CAST(rank AS BIGINT) AS rank FROM r{n_iter} ORDER BY id"
    )


G_PAGERANK_SQL = _pagerank_oracle_sql(PR_ITER)


# -- single-source BFS over the co-supply graph -------------------------

BFS_SOURCE = 1  # supplier key 1 exists at every SF
BFS_MAX_HOPS = 4


_CO_EDGES_CACHE: dict[tuple[str, str], tuple[tuple, DataFrame]] = {}
register_memo_cache(_CO_EDGES_CACHE)


def _co_supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared upstream of triangle counting and BFS: the support-
    thresholded co-supply projection is the expensive step (order-level
    self-join over lineitem), so it is computed once per (app, sf_dir)
    and lineage-cut — the same sharing discipline as the minhash
    signature frame in ``benchqueries.dedup``. Registered with
    ``memo`` so the bench clears it between timed runs, and guarded by
    the lineitem file fingerprint so regenerated data invalidates it."""
    key = (spark.sparkContext.applicationId, sf_dir)
    fprint = table_fingerprint(sf_dir, "lineitem")
    cached = _CO_EDGES_CACHE.get(key)
    if cached is not None and cached[0] == fprint:
        return cached[1]
    # One groupBy + in-row pair generation instead of dedup + order-key
    # self-join (r13 optimization, guide §2.4): collect each order's
    # distinct suppliers as a sorted array (collect_set folds the
    # (o, s) dedup into the same shuffle) and emit its C(k, 2) ordered
    # pairs with array higher-order functions — 2 shuffles total
    # (order groupBy + pair groupBy) where the join shape paid the
    # (o, s) dedup shuffle AND the self-join. Safe at any scale: a
    # TPC-H order has <= 7 lineitems, so the per-row array and its
    # <= 21 pairs are O(1). Verified identical output (47,703 edges at
    # sf0.1) before adoption.
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> transform("
                "slice(ss, i + 2, size(ss) - i - 1), y -> struct(x AS sa, y AS sb))))"
            )
        ).alias("p")
    ).select("p.sa", "p.sb")
    out = (
        pairs.groupBy("sa", "sb")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= CO_SUPPLY_SUPPORT)
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
        .localCheckpoint(eager=False)
    )
    _CO_EDGES_CACHE[key] = (fprint, out)
    return out


def g_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from supplier {BFS_SOURCE} to every co-supply-
    reachable supplier within {BFS_MAX_HOPS} hops (undirected: the edge
    list is symmetrized). The oracle replays the expansion as a
    UNION-deduplicating recursive CTE (state bounded by nodes x hops)
    and takes MIN(hops) — identical to first-reach BFS."""
    e = _co_supply_edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return bfs_distances(sym, BFS_SOURCE, BFS_MAX_HOPS).orderBy("id")


G_BFS_SQL = f"""
WITH RECURSIVE pairs AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
e0 AS (
  SELECT a.s AS x, b.s AS y
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
  GROUP BY a.s, b.s
  HAVING COUNT(*) >= {CO_SUPPLY_SUPPORT}),
e AS (SELECT x, y FROM e0 UNION ALL SELECT y, x FROM e0),
walk(node, d) AS (
  SELECT CAST({BFS_SOURCE} AS BIGINT), 0
  UNION
  SELECT e.y, w.d + 1 FROM walk w JOIN e ON e.x = w.node WHERE w.d < {BFS_MAX_HOPS})
SELECT node AS id, CAST(MIN(d) AS INTEGER) AS dist
FROM walk GROUP BY node ORDER BY id
"""


# -- label-propagation communities over the co-supply graph -------------

LPA_ITER = 3


def g_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LPA_ITER}-round synchronous label-propagation communities on the
    co-supply graph (smallest-label tie-break => fully deterministic;
    see ``operators.graph_algorithms.label_propagation``). Returns each
    supplier's community plus the community size."""
    e = _co_supply_edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = label_propagation(sym, n_iter=LPA_ITER)
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    return (
        labels.join(sizes, "label")
        .select("id", F.col("label").alias("community"), "community_size")
        .orderBy("id")
    )


def _lpa_oracle_sql(n_iter: int) -> str:
    ctes = [
        f"""pairs AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
e0 AS (
  SELECT a.s AS x, b.s AS y
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
  GROUP BY a.s, b.s
  HAVING COUNT(*) >= {CO_SUPPLY_SUPPORT}),
e AS (SELECT x, y FROM e0 UNION ALL SELECT y, x FROM e0),
verts AS (SELECT DISTINCT x AS id FROM e),
l0 AS (SELECT id, id AS label FROM verts)"""
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            f"""l{i} AS (
  SELECT v.id, COALESCE(p.label, v.id) AS label
  FROM verts v LEFT JOIN (
    SELECT id, label FROM (
      SELECT e.x AS id, l.label, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY e.x
                                ORDER BY COUNT(*) DESC, l.label ASC) AS rn
      FROM e JOIN l{i - 1} l ON e.y = l.id
      GROUP BY e.x, l.label)
    WHERE rn = 1) p ON v.id = p.id)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sizes AS (SELECT label, COUNT(*) AS community_size FROM l{n_iter} GROUP BY label)
SELECT l.id, l.label AS community, s.community_size
FROM l{n_iter} l JOIN sizes s ON l.label = s.label
ORDER BY l.id"""
    )


G_LPA_SQL = _lpa_oracle_sql(LPA_ITER)


# -- neighborhood feature aggregation (GNN sampling shape) --------------


def g_neighborhood_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node neighborhood features on the co-supply graph — the
    aggregation a GNN sampler materializes per layer: own degree, 1-hop
    neighbor degree sum/max, and the distinct 2-hop neighborhood size
    (excluding self). All-integer arithmetic => exact oracle.

    Scale shape: the degree frame is joined onto the edge list (both
    keyed on the node id — co-partitioned), 1-hop stats are one
    map-side-combinable aggregate, and the 2-hop count is the standard
    two-edge join with a distinct before counting; no collect, no
    per-row Python."""
    e = _co_supply_edges(spark, sf_dir)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    hop1 = (
        sym.join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("nd")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum("nd").alias("nbr_deg_sum"),
            F.max("nd").alias("nbr_deg_max"),
        )
    )
    two = (
        sym.select(F.col("src").alias("id"), F.col("dst").alias("mid"))
        .join(
            sym.select(F.col("src").alias("mid"), F.col("dst").alias("far")), "mid"
        )
        .where(F.col("far") != F.col("id"))
        .select("id", "far")
        .dropDuplicates()
        .groupBy("id")
        .agg(F.count("*").alias("n_two_hop"))
    )
    return (
        deg.join(hop1, "id")
        .join(two, "id", "left")
        .select(
            "id",
            "deg",
            F.col("nbr_deg_sum").cast("bigint").alias("nbr_deg_sum"),
            "nbr_deg_max",
            F.coalesce(F.col("n_two_hop"), F.lit(0)).cast("bigint").alias("n_two_hop"),
        )
        .orderBy("id")
    )


G_NEIGHBORHOOD_SQL = f"""
WITH pairs AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
e0 AS (
  SELECT a.s AS x, b.s AS y
  FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
  GROUP BY a.s, b.s
  HAVING COUNT(*) >= {CO_SUPPLY_SUPPORT}),
e AS (SELECT x, y FROM e0 UNION ALL SELECT y, x FROM e0),
deg AS (SELECT x AS id, COUNT(*) AS deg FROM e GROUP BY x),
hop1 AS (
  SELECT e.x AS id, CAST(SUM(d.deg) AS BIGINT) AS nbr_deg_sum,
         MAX(d.deg) AS nbr_deg_max
  FROM e JOIN deg d ON e.y = d.id GROUP BY e.x),
two AS (
  SELECT id, CAST(COUNT(*) AS BIGINT) AS n_two_hop FROM (
    SELECT DISTINCT a.x AS id, b.y AS far
    FROM e a JOIN e b ON a.y = b.x WHERE b.y <> a.x)
  GROUP BY id)
SELECT deg.id, deg.deg, hop1.nbr_deg_sum, hop1.nbr_deg_max,
       CAST(COALESCE(two.n_two_hop, 0) AS BIGINT) AS n_two_hop
FROM deg JOIN hop1 ON deg.id = hop1.id
LEFT JOIN two ON deg.id = two.id
ORDER BY deg.id
"""


QUERIES = {
    "g_triangle_count": QueryDef(
        g_triangle_count, G_TRIANGLES_SQL, "triangles in the supplier co-supply graph"
    ),
    "g_bfs_distances": QueryDef(
        g_bfs_distances, G_BFS_SQL, f"BFS hop distances <= {BFS_MAX_HOPS} from one supplier"
    ),
    "g_pagerank": QueryDef(
        g_pagerank, G_PAGERANK_SQL, f"{PR_ITER}-iter fixed-point PageRank, exact oracle"
    ),
    "g_label_prop": QueryDef(
        g_label_prop, G_LPA_SQL, f"{LPA_ITER}-round deterministic LPA communities"
    ),
    "g_neighborhood_agg": QueryDef(
        g_neighborhood_agg, G_NEIGHBORHOOD_SQL, "1/2-hop GNN-style node features"
    ),
}
