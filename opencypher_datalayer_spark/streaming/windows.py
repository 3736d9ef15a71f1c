"""Streaming window aggregations over an event stream.

The transformations are the *same* expressions as the batch versions in
``benchqueries.temporal`` — that equivalence is the test: a streaming run
over the finite events table (``availableNow`` trigger) must produce the
batch answer. Watermarks bound state for late data; in production the
source is Kafka/files-in-motion, here a parquet directory read as a
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Parquet streaming source needs an explicit schema. ``ts`` has shipped
# as both TIMESTAMP(NANOS) (read as raw int64 via nanosAsLong, floored
# to micros with integer division) and TIMESTAMP(MICROS) (TIMESTAMP_NTZ,
# reinterpreted in the UTC session zone) across driver data generations —
# same normalization as the batch loader in ``sources.tables``.
def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # one footer read decides which generation of the file we have
    ts_type = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema["ts"].dataType
    )
    nanos = ts_type.simpleString() == "bigint"
    # the table is a single parquet FILE; the file stream source wants a
    # directory, so stream the parent dir with a glob filter
    raw = (
        spark.readStream.schema(
            _events_raw_schema(T.LongType() if nanos else T.TimestampNTZType())
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos:
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """5-minute tumbling window x event_type with a late-data watermark —
    identical aggregation to ``benchqueries.temporal.ev_tumbling_window``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def stream_interval_join(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stream-stream join: each purchase matched to the same user's
    clicks in the preceding hour. Watermarks on BOTH sides + the time
    band bound the join state (clicks older than purchase-watermark -
    1h are evicted) — the canonical bounded-state stream-stream join.
    Identical condition to ``benchqueries.temporal.ev_interval_join``.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key(s)
    arriving within the watermark horizon — the streaming form of
    ``dedup_exact`` and the standard at-least-once -> exactly-once
    repair step in a training-data ingest pipeline. State is one entry
    per key, evicted when the event-time watermark passes it (bounded,
    unlike a plain ``dropDuplicates`` on a stream which keeps state
    forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def run_to_memory(agg: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drive a streaming aggregation to completion over the finite input
    (availableNow) into an in-memory sink; returns the StreamingQuery."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def enrich_stream(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: attach slowly-changing dimension
    attributes to each event. The static side is re-planned per
    micro-batch (so dimension updates are picked up between batches) and
    is broadcast when small — the stateless, no-watermark fast path that
    covers most pipeline enrichments; reach for a stream-stream join
    only when BOTH sides move."""
    return events.join(F.broadcast(dim), key, "left")


def stream_funnel(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Chained stream-stream joins: the 3-step funnel (view -> click ->
    purchase, each step within 30 minutes) as two time-banded joins with
    watermarks on every input — Spark's multiple-stateful-operator
    pipeline. State for each join is bounded by the watermark plus the
    30-minute band; identical chain condition to
    ``benchqueries.temporal.ev_funnel``'s vcp stage."""
    step = F.expr("INTERVAL 30 MINUTES")

    def leg(t: str, user: str, ts: str) -> DataFrame:
        return (
            events.where(F.col("event_type") == t)
            .select(F.col("user_id").alias(user), F.col("ts").alias(ts))
            .withWatermark(ts, watermark)
        )

    vc = leg("view", "v_user", "v_ts").join(
        leg("click", "c_user", "c_ts"),
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + step),
    )
    # downstream stateful ops allow ONE event-time column: rebuild v_ts
    # through integer micros so it sheds its watermark metadata and
    # c_ts alone drives the second join's state eviction
    vc = vc.withColumn("v_ts", F.timestamp_micros(F.unix_micros(F.col("v_ts"))))
    return vc.join(
        leg("purchase", "p_user", "p_ts"),
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + step),
    ).select("v_user", "v_ts", "c_ts", "p_ts")
