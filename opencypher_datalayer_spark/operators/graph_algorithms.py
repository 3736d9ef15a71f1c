"""Graph analytics operators — the 'GraphX role' of this engine
(BASELINE.json north star), realized as DataFrame joins/aggregations
(GraphX has no PySpark binding; its analytics role maps onto motif
joins + iterative joins, SURVEY §1.4).

Determinism discipline: PageRank runs in *integer fixed-point*
(ranks scaled by 1e12, contributions use integer floor division), so
every engine computing the same iteration count gets bit-identical
ranks — float accumulation order never enters. That is what makes a
full value-level DuckDB oracle possible for an iterative algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1e9 fixed-point: total rank mass is n_nodes * SCALE and the damping
# step multiplies a node's in-mass by 85 before dividing — 1e9 keeps
# that product inside int64 up to ~1e8 nodes (drop SCALE further, or go
# decimal, beyond that).
PR_SCALE = 1_000_000_000
PR_DAMPING_NUM = 85  # damping 0.85 as an exact integer ratio
PR_DAMPING_DEN = 100


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over the undirected simple graph induced by
    the edge list. Canonical a<b<c enumeration over the de-duplicated
    (min,max) edge set: two joins, no double counting.

    Scale: the first join fans out on shared low vertex (skew on hubs →
    AQE skew split); the closing-edge join is an equi-join on the pair.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = e1.join(e2, ["x"]).where(F.col("y") < F.col("z"))
    closing = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    return wedges.join(closing, ["y", "z"]).agg(F.count("*").alias("n_triangles"))


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iter: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over the directed edge list, integer fixed-point.

    Per iteration (all integer arithmetic, deterministic):
      contrib(v)   = floor(rank(u) / out_degree(u)) summed over in-edges
      rank'(v)     = floor((1-d)*SCALE) + floor(d * contribs / 100)
    Dangling-node mass is dropped (standard simplified variant) and
    nodes with no in-edges hold the teleport term only.

    Returns (id, rank) with rank still in fixed-point scale. Each
    iteration is one shuffle join edges x ranks + one aggregation; the
    loop is driver-side control flow with lineage cut per round.
    """
    verts = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .dropDuplicates()
        .localCheckpoint()
    )
    out_deg = edges.groupBy(F.col(src).alias("id")).agg(F.count("*").alias("deg"))
    # edge list annotated with source out-degree, reused every round
    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .join(out_deg.withColumnRenamed("id", "u"), "u")
        .localCheckpoint()
    )
    teleport = (PR_DAMPING_DEN - PR_DAMPING_NUM) * PR_SCALE // PR_DAMPING_DEN

    ranks = verts.withColumn("rank", F.lit(PR_SCALE).cast("bigint"))
    for _ in range(n_iter):
        contribs = (
            ed.join(ranks.withColumnRenamed("id", "u"), "u")
            # `div`: true int64 division — `/` would detour through
            # doubles and lose exactness past 2^53
            .select("v", F.expr("rank div deg").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("contribs"))
        )
        ranks = verts.join(contribs.withColumnRenamed("v", "id"), "id", "left").select(
            "id",
            (
                F.lit(teleport)
                + F.expr(
                    f"(coalesce(contribs, 0L) * {PR_DAMPING_NUM}) div {PR_DAMPING_DEN}"
                )
            ).alias("rank"),
        )
        # no per-iteration checkpoint: it would erase the output
        # partitioning (forcing a fresh shuffle every round) and the
        # lineage is only n_iter joins deep — shallow for typical
        # iteration counts. Checkpoint outside if n_iter is large.
    return ranks
