"""Temporal / event-stream operators over ``events``.

These are the batch expressions of the streaming operators in
``streaming/`` (identical logic under ``readStream`` + watermark); as
batch queries they get full DuckDB oracles — including an as-of join
checked against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.sources.tables import load_table

DEC = "decimal(18,6)"


# -- tumbling window aggregation ---------------------------------------


def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window x event_type: count + exact value sum.
    ``F.window`` is the same operator Structured Streaming uses."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


EV_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
       COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# -- streaming twin as a first-class driver query -----------------------

_ST_SINK_SEQ = __import__("itertools").count()


def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Structured Streaming pipeline, driver-checkable: the
    events table replayed as a bounded file stream, event-time watermark,
    5-minute tumbling window aggregation, ``availableNow`` micro-batches
    into a memory sink. The returned frame is the final sink state —
    value-oracled against DuckDB exactly like a batch query, which pins
    the stream/batch equivalence the streaming module claims. The batch
    expression of the same aggregation (``ev_tumbling_window``) is this
    entry's extended-tier twin."""
    from opencypher_datalayer_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_counts,
    )

    sink = f"st_tumbling_sink_{next(_ST_SINK_SEQ)}"
    q = run_to_memory(tumbling_counts(read_events_stream(spark, sf_dir)), sink)
    q.stop()
    return spark.table(sink).orderBy("window_start", "event_type")


# -- sliding window (1h window, 15m slide) ------------------------------


def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).where(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast(DEC)).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


# each event lands in 4 sliding windows: the bucket of (ts - k*15min), k=0..3
EV_SLIDING_SQL = """
WITH expanded AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS window_start,
         value
  FROM events, (SELECT unnest([0,1,2,3]) AS k)
  WHERE event_type = 'purchase')
SELECT window_start, COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY window_start
ORDER BY window_start
"""


# -- sessionization -----------------------------------------------------

SESSION_GAP_MIN = 30


def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic gap-based sessionization: a >30-minute silence starts a new
    session. lag + conditional cumsum over a per-user window — one
    shuffle on user_id, then linear in-partition work."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
            > SESSION_GAP_MIN * 60,
            1,
        )
        .otherwise(0),
    )
    sessions = gapped.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


EV_SESSIONIZE_SQL = f"""
WITH gapped AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM gapped)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM sessions
GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


# -- as-of join ---------------------------------------------------------


def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent prior-or-equal click
    (checked against DuckDB's native ASOF JOIN).

    Spark lacks a native as-of join; the scalable composition is a
    union-tag-and-carry-forward: union both sides ordered by time within
    user, carry the last click timestamp forward with
    ``last(..., ignorenulls)`` over an unbounded-preceding frame, then
    keep the purchase rows. One shuffle on user_id, no range explosion.
    """
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(1).alias("is_click"),
        F.lit(None).cast("bigint").alias("event_id"), F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(0).alias("is_click"), "event_id", "value",
    )
    unioned = clicks.unionByName(purchases)
    # clicks sort before purchases at equal ts => "prior or equal" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", F.col("is_click").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_click_ts",
        F.last(F.when(F.col("is_click") == 1, F.col("ev_ts")), ignorenulls=True).over(w),
    )
    return (
        carried.where(F.col("is_click") == 0)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ev_ts").alias("purchase_ts"),
            F.col("value").cast(DEC).alias("purchase_value"),
            "last_click_ts",
        )
        .orderBy("user_id", "purchase_ts", "purchase_id")
    )


EV_ASOF_SQL = """
SELECT p.user_id AS user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
       CAST(CAST(p.value AS DECIMAL(18,6)) AS DOUBLE) AS purchase_value,
       c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY user_id, purchase_ts, purchase_id
"""


# -- interval (range) join ----------------------------------------------


def ev_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to ALL of the same user's clicks in the
    preceding hour — the range-join shape (inequality band on time).
    Spark plans user_id as the equi key with the band as a post-join
    filter; the streaming twin (stream-stream join with watermarks,
    tests/test_streaming.py) uses the identical condition."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id"),
    )
    return (
        purchases.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id", "purchase_id", "purchase_ts", "click_id", "click_ts")
        .orderBy("user_id", "purchase_id", "click_id")
    )


EV_INTERVAL_SQL = """
SELECT p.user_id AS user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
       c.event_id AS click_id, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
ORDER BY user_id, purchase_id, click_id
"""


# -- semi-structured JSON extraction ------------------------------------


def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the ``props`` string column
    (``get_json_object`` — JVM-side JSON path, no UDF), bucketed and
    aggregated. The scale note: JSON parsing happens once per row inside
    whole-stage codegen; a VariantType/from_json shredding step would be
    the columnar-storage answer at rest."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"), F.col("value").cast(DEC).alias("v"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("v").alias("total_value"),
        )
        .orderBy("event_type", "k_bucket")
    )


EV_JSON_SQL = """
SELECT event_type, CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, k_bucket
"""


# -- ranked event funnel ------------------------------------------------


def ev_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event of each type per user (dedup-by-rank) + per-type counts."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    firsts = ev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        firsts.groupBy("event_type")
        .agg(
            F.count("*").alias("n_users"),
            F.min("ts").alias("earliest"),
            F.max("ts").alias("latest"),
        )
        .orderBy("event_type")
    )


EV_FIRST_TOUCH_SQL = """
WITH firsts AS (
  SELECT user_id, event_type, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events)
SELECT event_type, COUNT(*) AS n_users, MIN(ts) AS earliest, MAX(ts) AS latest
FROM firsts WHERE rn = 1
GROUP BY event_type
ORDER BY event_type
"""


# -- gap-fill / resample ------------------------------------------------

GAPFILL_USER_MOD = 50  # keep the per-user grid fan-out bounded in tests


def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto an hourly grid with
    forward-fill — the gap-fill operator time-series stores ship
    natively, composed from Spark primitives: per-user min/max bounds
    one tiny aggregate, ``sequence`` + ``explode`` generates the grid
    (no driver loop), observations aggregate per bucket with
    ``max_by(value, (ts, event_id))`` (exact last-in-bucket, no float
    accumulation), and the fill is ``last(ignorenulls)`` over the
    user-partitioned grid order.

    Scale shape: grid generation is embarrassingly parallel from the
    per-user bounds row; the bucket aggregate and the fill window both
    key on user_id, so the whole pipeline is one shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).where(
        F.col("user_id") % GAPFILL_USER_MOD == 0
    )
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.groupBy("user_id").agg(
        F.min(hour).alias("h_min"), F.max(hour).alias("h_max")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("grid_ts"),
    )
    # last-in-bucket needs a TOTAL order key; DuckDB's max_by takes only
    # scalar keys, so encode (ts, event_id) as one fixed-width string —
    # lexicographic order == numeric order for zero-padded fields
    last_key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    obs = (
        ev.groupBy("user_id", hour.alias("grid_ts"))
        .agg(
            F.count("*").alias("n_obs"),
            F.max_by("value", last_key).alias("last_value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user_id", "grid_ts"], "left")
        .select(
            "user_id",
            "grid_ts",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
            F.last("last_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("user_id", "grid_ts")
    )


EV_GAPFILL_SQL = f"""
WITH ev AS (
  SELECT * FROM events WHERE user_id % {GAPFILL_USER_MOD} = 0),
bounds AS (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS h_min,
         date_trunc('hour', MAX(ts)) AS h_max
  FROM ev GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR))
           AS grid_ts
  FROM bounds),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS grid_ts,
         CAST(COUNT(*) AS BIGINT) AS n_obs,
         max_by(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                       || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_value
  FROM ev GROUP BY user_id, date_trunc('hour', ts))
SELECT g.user_id, g.grid_ts,
       COALESCE(o.n_obs, 0) AS n_obs,
       last_value(o.last_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.grid_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.grid_ts = o.grid_ts
ORDER BY g.user_id, g.grid_ts
"""


# -- funnel analysis ----------------------------------------------------

FUNNEL_STEP_MIN = 30  # max minutes between consecutive funnel steps


def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step funnel view -> click -> purchase with each step within
    {FUNNEL_STEP_MIN} minutes of the previous: distinct users reaching
    each stage, existence semantics (ANY qualifying chain converts the
    user — order-independent, so partitioning never changes the answer).

    Scale shape: two time-banded equi-joins on ``user_id`` (the same
    range-join pattern as ``ev_interval_join``, so all three frames
    co-partition on the user key and the bands bound the per-user
    fan-out), then one distinct-count pass per stage."""
    ev = load_table(spark, "events", sf_dir)
    step = F.expr(f"INTERVAL {FUNNEL_STEP_MIN} MINUTES")

    def stage(t: str, user: str, ts: str) -> DataFrame:
        return ev.where(F.col("event_type") == t).select(
            F.col("user_id").alias(user), F.col("ts").alias(ts)
        )

    views = stage("view", "v_user", "v_ts")
    clicks = stage("click", "c_user", "c_ts")
    purchases = stage("purchase", "p_user", "p_ts")
    vc = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") > F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + step),
    )
    vcp = vc.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + step),
    )
    return (
        views.agg(F.countDistinct("v_user").alias("n_view"))
        .crossJoin(vc.agg(F.countDistinct("v_user").alias("n_view_click")))
        .crossJoin(vcp.agg(F.countDistinct("v_user").alias("n_full_funnel")))
    )


EV_FUNNEL_SQL = f"""
WITH v AS (SELECT user_id u, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id u, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id u, ts FROM events WHERE event_type = 'purchase'),
vc AS (
  SELECT v.u, c.ts AS c_ts FROM v JOIN c ON v.u = c.u
  AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL {FUNNEL_STEP_MIN} MINUTE),
vcp AS (
  SELECT vc.u FROM vc JOIN p ON vc.u = p.u
  AND p.ts > vc.c_ts AND p.ts <= vc.c_ts + INTERVAL {FUNNEL_STEP_MIN} MINUTE)
SELECT (SELECT COUNT(DISTINCT u) FROM v) AS n_view,
       (SELECT COUNT(DISTINCT u) FROM vc) AS n_view_click,
       (SELECT COUNT(DISTINCT u) FROM vcp) AS n_full_funnel
"""


def cy_temporal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal VALUE functions through the Cypher front-end: the events
    table as an Event graph (ts stored as a string property, the write
    model's value domain), filtered with ``datetime(e.ts)`` against a
    ``datetime literal + duration({days: ...})`` bound — the idiom the
    round-4 verdict named as the first thing an event-graph user writes.
    Counts per event type inside the window; oracle is plain SQL over
    the raw timestamps."""
    from opencypher_datalayer_spark.plans import run_cypher
    from opencypher_datalayer_spark.store import GraphStore

    ev = load_table(spark, "events", sf_dir)
    nodes = ev.select(
        F.concat(F.lit("ev:"), F.col("event_id").cast("string")).alias("gid"),
        F.lit("Event").alias("label"),
        F.lit("events").alias("source"),
        F.create_map(
            F.lit("ts"), F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            F.lit("type"), F.col("event_type"),
        ).alias("props"),
    )
    store = GraphStore(nodes, GraphStore.empty(spark).edges)
    return run_cypher(
        store,
        "MATCH (e:Event) "
        "WHERE datetime(e.ts) >= datetime('2024-01-08T00:00:00') "
        "AND datetime(e.ts) < datetime('2024-01-08T00:00:00') + duration({days: 7}) "
        "RETURN e.type AS event_type, count(*) AS n ORDER BY event_type",
    )


CY_TEMPORAL_FILTER_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts < TIMESTAMP '2024-01-08 00:00:00' + INTERVAL 7 DAY
GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "ev_tumbling_window": QueryDef(ev_tumbling_window, EV_TUMBLING_SQL, "5m tumbling window agg"),
    "cy_temporal_filter": QueryDef(
        cy_temporal_filter,
        CY_TEMPORAL_FILTER_SQL,
        "Cypher datetime()/duration arithmetic over the event graph",
    ),
    "st_tumbling_window": QueryDef(
        st_tumbling_window,
        EV_TUMBLING_SQL,
        "streaming watermark window: final memory-sink state (availableNow)",
    ),
    "ev_sliding_window": QueryDef(ev_sliding_window, EV_SLIDING_SQL, "1h/15m sliding window"),
    "ev_sessionize": QueryDef(ev_sessionize, EV_SESSIONIZE_SQL, "gap-based sessionization"),
    "ev_asof_join": QueryDef(ev_asof_join, EV_ASOF_SQL, "as-of join vs native ASOF"),
    "ev_first_touch": QueryDef(ev_first_touch, EV_FIRST_TOUCH_SQL, "first-touch dedup by rank"),
    "ev_json_props": QueryDef(ev_json_props, EV_JSON_SQL, "JSON path extraction + agg"),
    "ev_interval_join": QueryDef(ev_interval_join, EV_INTERVAL_SQL, "1-hour range join"),
    "ev_funnel": QueryDef(
        ev_funnel, EV_FUNNEL_SQL, f"3-step funnel, {FUNNEL_STEP_MIN}m step windows"
    ),
    "ev_gap_fill": QueryDef(
        ev_gap_fill, EV_GAPFILL_SQL, "hourly grid resample + forward fill"
    ),
}
