"""Measured AQE verdict for the LSH band-join hot spot.

`band_self_join` is the dedup hot path: docs sharing a (band_idx,
band_hash) bucket are candidate pairs. A hot bucket (a band hash shared
by thousands of docs) lands on one shuffle partition. Salting by
replication (`operators.scale.salted_join`) does NOT apply here — both
sides of a self-join are the same large frame, so there is no small
side to replicate. The scale mechanism is AQE's skew-join split, which
partitions the hot bucket's rows into advisory-sized chunks on both
sides and joins the chunk pairs.

This test runs the REAL join shape on a synthetic skewed bucket
distribution with the skew thresholds scaled down to test-data sizes
(the ratios, not the absolute bytes, are what transfer to a cluster)
and asserts from the executed adaptive plan that the split actually
happened and the result is exact.
"""

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.dedup import band_self_join

HOT = 1500  # docs sharing one band hash -> C(1500,2) pairs in one bucket
TAIL_BUCKETS = 200  # 2 docs each -> 1 pair per bucket


def _skewed_bands(spark):
    hot = spark.range(HOT).select(
        F.concat(F.lit("d"), F.format_string("%05d", "id")).alias("doc_id"),
        F.lit(0).alias("band_idx"),
        F.lit("HOT").alias("band_hash"),
    )
    tail = spark.range(2 * TAIL_BUCKETS).select(
        F.concat(F.lit("t"), F.format_string("%05d", "id")).alias("doc_id"),
        F.lit(1).alias("band_idx"),
        F.concat(F.lit("b"), F.col("id") % TAIL_BUCKETS).alias("band_hash"),
    )
    # materialize so the shuffle stage sees real (skewed) input stats
    return hot.union(tail).localCheckpoint()


def test_band_join_hot_bucket_is_aqe_split(spark):
    confs = {
        # no broadcast: force the shuffle join AQE skew-handles
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # scale the skew thresholds down to the test data volume; at
        # cluster scale the defaults (256MB/64MB) play the same role
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        agg = band_self_join(_skewed_bands(spark)).groupBy().count()
        [row] = agg.collect()  # executes THIS QueryExecution (final AQE plan)
        assert row["count"] == HOT * (HOT - 1) // 2 + TAIL_BUCKETS

        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # the hot bucket was detected and split on both self-join sides
        assert "skew=true" in plan, plan
        assert plan.count("AQEShuffleRead skewed") >= 2, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_band_join_result_unchanged_without_skew_split(spark):
    """Same data, default thresholds (no split at this volume): the
    optimization is plan-only — byte-identical pair sets either way."""
    agg = band_self_join(_skewed_bands(spark)).groupBy().count()
    [row] = agg.collect()
    assert row["count"] == HOT * (HOT - 1) // 2 + TAIL_BUCKETS
