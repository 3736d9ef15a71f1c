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
