"""Continuous incremental graph sync: a stream of entity envelope rows
applied to the GraphStore per micro-batch via ``foreachBatch``.

This is the streaming form of the incremental writer (W11): each
micro-batch is one ``apply_batch`` — exactly the unit the reference's
per-batch Neo4j transaction was — so batch and streaming ingest share
one code path and one set of semantics (deletes -> upserts -> stubs ->
edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from opencypher_datalayer_spark.ingest import DataLayer


class StreamingGraphSync:
    """foreachBatch sink applying entity micro-batches to a DataLayer.

    Use: ``stream.writeStream.foreachBatch(sync.apply).start()`` where
    ``stream`` has the entity envelope schema (``model.ENTITY_SCHEMA``).
    Exactly-once per epoch: versioned-storage commits are idempotent
    replays (merge by natural key), matching foreachBatch's
    at-least-once delivery.
    """

    def __init__(self, layer: DataLayer, dataset_name: str):
        self.layer = layer
        self.dataset = layer.datasets[dataset_name]

    def apply(self, batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        self.layer._apply(batch, self.dataset)
