"""Cell-partitioned IVF vector index with a partition-pruned probe scan.

The registry's :func:`~..benchqueries.similarity.sim_ivf_topk` computes
the cell assignment inline and joins probe cells against the full
assignment frame — at toy scale the join's build side is the whole
corpus, and SCALE.md's "what a 100x run would hit" list flags exactly
that: the candidate frame grows with the corpus and wants coarse-cell
pruning pushed into the parquet SCAN, not applied after it.

This module is that storage path:

- :func:`build_ivf_index` assigns every vector to its nearest coarse
  centroid (argmax cosine, 6dp round, centroid-id tie-break — byte-for-
  byte the same rule as ``sim_ivf_topk`` / its DuckDB oracle) and writes
  the corpus hive-partitioned by ``cell``
  (``.write.partitionBy("cell")``), plus the centroid codebook.
  Partition directories ARE the storage manifest: Spark's partition
  discovery maps cell -> file set with no extra metadata store.
- :func:`ivf_pruned_topk` resolves each query's ``nprobe`` nearest
  cells from the (tiny, broadcast) codebook, collects the admitted cell
  set — bounded by ``min(n_query * nprobe, k_cells)`` ints, never
  corpus-sized — and probes with
  ``read.parquet(index).where(cell IN admitted)``: Catalyst turns the
  IN-list on the partition column into static partition pruning, so
  files in non-admitted cells are never opened.  The plan-audit test
  pins this by counting scanned files.

At 100 TB the probe cost becomes (admitted cells / k_cells) of the
corpus instead of all of it, and the pruning happens before any I/O —
the difference between "scan 100 TB then filter" and "scan 200 GB".

Result parity: output is row-identical to ``sim_ivf_topk`` (same
scoring, rounding, tie-breaks), so the existing DuckDB oracle
``SIM_IVF_TOPK_SQL`` value-checks this path too.

Reference anchor: the reference delegates all retrieval to Neo4j
(``neo4j.go:238-284`` transactions; no vector surface) — this operator
family is part of the engine's training-data-pipeline extension, not a
reference port.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_ivf_index(
    spark: SparkSession,
    embeddings: DataFrame,
    index_dir: str,
    k_cells: int = 8,
) -> None:
    """Write ``embeddings`` (``vec_id``, ``embedding array<float>``) as a
    cell-partitioned IVF index under ``index_dir``.

    Layout::

        index_dir/centroids/   k_cells rows: cell, cv, cn
        index_dir/vectors/     cell=<i>/...: vec_id, v, nrm

    The coarse quantizer is the registry's deterministic-sample codebook
    (``vec_id < k_cells``) so results stay oracle-comparable; a real
    deployment would drop in offline k-means centroids — build/probe
    mechanics are identical.

    One shuffle total: the argmax-cosine assignment is a broadcast
    cross-join (codebook is k_cells rows) + per-vector window, then the
    write repartitions by ``cell`` so each partition directory is
    written by the executors that own its rows (no driver funnel).
    """
    from pyspark.sql import Window

    from opencypher_datalayer_spark.benchqueries.similarity import _dot, _norm, _vec

    emb = embeddings.select("vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm"))
    cents = emb.where(F.col("vec_id") < k_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cents.coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    cos = F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cell").asc())
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", cos)
        .withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") == 1)
        .select("vec_id", "cell", "v", "nrm")
    )
    (
        assign.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "vectors"))
    )


def ivf_pruned_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """Top-``topk`` cosine neighbors for ``queries`` (``q_id``, ``qv``
    array<double>, ``qn``) against a :func:`build_ivf_index` index,
    scanning ONLY the partition directories of admitted cells.

    The admitted-cell collect is bounded by ``n_queries * nprobe``
    (queries per request are bounded; at k_cells=4096 / nprobe=8 that is
    a few thousand ints) — it is the one driver round-trip that turns
    runtime knowledge into static partition pruning at the scan.

    The scored exchange is slim: an Arrow-batched map-side partial
    top-k runs before the ranking window, so the shuffle carries
    batches x queries x topk rows, never the admitted corpus slice.
    """
    from pyspark.sql import Window

    from opencypher_datalayer_spark.benchqueries.similarity import _dot, _partial_topk

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    qcos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    wprobe = Window.partitionBy("q_id").orderBy(F.col("p_cos").desc(), F.col("cell").asc())
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .withColumn("p_cos", qcos)
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= nprobe)
        .select("q_id", "qv", "qn", "cell")
    )
    # bounded driver round-trip: <= n_queries * nprobe cell ids
    admitted = sorted({r.cell for r in probes.select("cell").distinct().collect()})

    vectors = spark.read.parquet(os.path.join(index_dir, "vectors")).where(
        F.col("cell").isin(admitted)  # partition column -> static pruning at the scan
    )
    cand = vectors.select(
        F.col("vec_id").alias("c_id"),
        F.col("cell"),
        F.col("v").alias("cv2"),
        F.col("nrm").alias("cn2"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn2")), 6)
    scored = (
        probes.join(cand, "cell")
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
    )
    slim = scored.mapInPandas(
        _partial_topk("cosine", topk), "q_id bigint, c_id bigint, cosine double"
    )
    wk = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        slim.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= topk)
        .select("q_id", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )
