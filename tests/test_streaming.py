"""Streaming == batch equivalence tests (availableNow over the finite
events table), plus foreachBatch graph sync."""

import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.temporal import ev_tumbling_window
from opencypher_datalayer_spark.ingest import DataLayer
from opencypher_datalayer_spark.model import ENTITY_SCHEMA
from opencypher_datalayer_spark.streaming.sync import StreamingGraphSync
from opencypher_datalayer_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    q = run_to_memory(tumbling_counts(events), "stream_tumbling")
    try:
        streamed = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in spark.sql("SELECT * FROM stream_tumbling").collect()
        }
        batch = {
            (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
            for r in ev_tumbling_window(spark, sf_dir).collect()
        }
        assert streamed == batch
    finally:
        q.stop()


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Duplicated delivery (the events table written twice into the
    source directory) collapses back to exactly the distinct event_ids."""
    from opencypher_datalayer_spark.sources.tables import load_table
    from opencypher_datalayer_spark.streaming.windows import dedup_stream

    # write the NORMALIZED table twice so the stream schema is the
    # engine's own envelope, independent of the source file's ts encoding
    norm = load_table(spark, "events", sf_dir)
    src = tmp_path / "dup_events"
    norm.write.mode("overwrite").parquet(str(src / "copy1"))
    norm.write.mode("overwrite").parquet(str(src / "copy2"))

    stream = (
        spark.readStream.schema(norm.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_distinct = load_table(spark, "events", sf_dir).select("event_id").distinct().count()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM stream_dedup").collect()[0]
    assert (got["n"], got["d"]) == (n_distinct, n_distinct)


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream join over the finite events table must produce the
    batch interval join's rows (append mode emits a match once both
    watermarks pass it; availableNow drains the whole table, so all
    matches emit)."""
    from opencypher_datalayer_spark.benchqueries.temporal import ev_interval_join
    from opencypher_datalayer_spark.streaming.windows import stream_interval_join

    events = read_events_stream(spark, sf_dir)
    q = (
        stream_interval_join(events)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ivj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_ivj").collect()
    }
    batch = {tuple(r) for r in ev_interval_join(spark, sf_dir).collect()}
    assert streamed == batch


def test_stateful_sessionize_stream(spark, sf_dir):
    """applyInPandasWithState sessionization: every emitted session must
    exactly match a batch session; all gap-closed sessions are emitted;
    sessions not emitted are only those too close to stream end for the
    event-time timeout to fire (watermark delay + gap)."""
    from opencypher_datalayer_spark.benchqueries.temporal import ev_sessionize
    from opencypher_datalayer_spark.streaming.sessions import (
        SESSION_GAP_MIN,
        sessionize_stream,
    )

    events = read_events_stream(spark, sf_dir)
    q = (
        sessionize_stream(events, watermark="2 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]): r["total_value"]
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }
    batch_rows = ev_sessionize(spark, sf_dir).collect()
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]): float(
            r["total_value"]
        )
        for r in batch_rows
    }

    assert set(streamed) <= set(batch)
    for k, v in streamed.items():
        assert abs(v - batch[k]) < 1e-6

    n_users = len({r["user_id"] for r in batch_rows})
    assert len(streamed) >= len(batch) - n_users  # every gap-closed session emitted

    max_ts = max(r["session_end"] for r in batch_rows)
    horizon_s = 2 * 3600 + SESSION_GAP_MIN * 60
    for k in set(batch) - set(streamed):
        assert (max_ts - k[2]).total_seconds() <= horizon_s


def test_foreachbatch_graph_sync(spark, tmp_path):
    """Entity rows streamed from files produce the same graph state as
    batch ingest of the same entities."""
    src = tmp_path / "entities"
    src.mkdir()
    rows = [
        {
            "id": f"urn:x/{i}",
            "props": {"urn:p/name": f"e{i}"},
            "refs": {"urn:r/knows": [f"urn:x/{(i + 1) % 6}"]},
            "deleted": False,
            "_seq": i,
        }
        for i in range(6)
    ]
    spark.createDataFrame(rows, ENTITY_SCHEMA).coalesce(1).write.mode("overwrite").parquet(
        str(src / "batch0")
    )

    layer = DataLayer(
        spark,
        {"dataset_definitions": [{"name": "people", "source_config": {"label": "Person"}}]},
    )
    sync = StreamingGraphSync(layer, "people")
    stream = spark.readStream.schema(ENTITY_SCHEMA).parquet(str(src / "batch0"))
    q = (
        stream.writeStream.foreachBatch(sync.apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert layer.store.nodes.where(F.col("label") == "Person").count() == 6
    assert layer.store.edges.where(F.col("rel_type") == "knows").count() == 6


def test_streaming_chunking_equals_batch(spark, sf_dir):
    """chunk_transform is stateless column expressions, so the identical
    pipeline runs on a document stream (append mode, no state) and must
    emit exactly the batch chunk set."""
    from pyspark.sql import types as T

    from opencypher_datalayer_spark.benchqueries.text import (
        chunk_transform,
        text_chunk_windows,
    )

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = (
        spark.readStream.schema(doc_schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    q = run_to_memory(chunk_transform(docs), "stream_chunks", output_mode="append")
    try:
        streamed = {
            tuple(r) for r in spark.sql("SELECT * FROM stream_chunks").collect()
        }
        batch = {tuple(r) for r in text_chunk_windows(spark, sf_dir).collect()}
        assert streamed == batch and len(streamed) > 0
    finally:
        q.stop()


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    """Stream-static broadcast enrichment must equal the batch join."""
    from opencypher_datalayer_spark.sources.tables import load_table
    from opencypher_datalayer_spark.streaming.windows import enrich_stream

    # derived user dimension: cohort by user-id residue (stands in for a
    # customer table keyed on the stream's join column)
    dim = (
        load_table(spark, "events", sf_dir)
        .select("user_id")
        .distinct()
        .withColumn("cohort", (F.col("user_id") % 7).cast("int"))
    )
    q = (
        enrich_stream(read_events_stream(spark, sf_dir), dim)
        .groupBy("cohort")
        .agg(F.count("*").alias("n"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_enrich")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["cohort"], r["n"]) for r in spark.sql("SELECT * FROM stream_enrich").collect()
    }
    batch = {
        (r["cohort"], r["n"])
        for r in enrich_stream(load_table(spark, "events", sf_dir), dim)
        .groupBy("cohort")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert streamed == batch


def test_stream_funnel_chain_equals_batch(spark, sf_dir):
    """Chained stream-stream joins (two time-banded joins, watermarks on
    all inputs) emit exactly the batch funnel chains."""
    from opencypher_datalayer_spark.sources.tables import load_table
    from opencypher_datalayer_spark.streaming.windows import stream_funnel

    q = (
        stream_funnel(read_events_stream(spark, sf_dir))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_funnel")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM stream_funnel").collect()
    }

    ev = load_table(spark, "events", sf_dir)
    step = F.expr("INTERVAL 30 MINUTES")
    leg = lambda t, u, ts: ev.where(F.col("event_type") == t).select(  # noqa: E731
        F.col("user_id").alias(u), F.col("ts").alias(ts)
    )
    batch_df = (
        leg("view", "v_user", "v_ts")
        .join(
            leg("click", "c_user", "c_ts"),
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") > F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + step),
        )
        .join(
            leg("purchase", "p_user", "p_ts"),
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + step),
        )
        .select("v_user", "v_ts", "c_ts", "p_ts")
    )
    batch = {tuple(r) for r in batch_df.collect()}
    assert streamed == batch
