"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked), but the Spark-side plumbing —
binary columns, schema, ``mapInPandas`` batch iteration, partitioning —
is real and tested. ``mm_binary_meta`` (pure column ops on the blob)
carries a full DuckDB oracle; the pandas-UDF pipeline is the
non-SQL-expressible case and registers without one (driver does the
rows-only check).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.sources.tables import load_table

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, channels int, mean_byte double"
)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text encoded to an opaque binary payload column — the
    stand-in for real image/audio bytes."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


# -- pure-column blob metadata (oracle-checked) -------------------------


def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _payloads(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.lower(F.substring(F.hex("payload"), 1, 16)).alias("head_hex"),
        F.md5("payload").alias("payload_md5"),
    ).orderBy("doc_id")


MM_BINARY_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
       md5(text) AS payload_md5
FROM documents
ORDER BY doc_id
"""


# -- fake decode via mapInPandas (non-SQL-expressible path) -------------


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE DECODER (no codecs in this container): derives deterministic
    'image' metadata from the payload bytes. A real deployment swaps this
    body for PIL/libav decode — the batch shape, schema, and partitioning
    are exactly what that version uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        first = payloads.map(lambda b: b[0] if len(b) else 0)
        second = payloads.map(lambda b: b[1] if len(b) > 1 else 0)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "width": (16 + (first % 64)).astype("int32"),
                "height": (16 + (second % 64)).astype("int32"),
                "channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int32"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
            }
        )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload -> mapInPandas fake-decode -> per-'image' features,
    then an aggregate over the decoded metadata (the shape of a real
    resize/feature pipeline)."""
    decoded = _payloads(spark, sf_dir).mapInPandas(fake_decode_batch, DECODED_SCHEMA)
    return (
        decoded.groupBy("channels")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
            F.round(F.avg("mean_byte"), 4).alias("avg_mean_byte"),
        )
        .orderBy("channels")
    )


QUERIES = {
    "mm_binary_meta": QueryDef(mm_binary_meta, MM_BINARY_META_SQL, "blob metadata, pure columns"),
    "mm_decode_features": QueryDef(
        mm_decode_features, None, "mapInPandas fake-decode pipeline (rows-only check)"
    ),
}
