"""Multimodal column handling: opaque ``binary`` payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (clearly marked), but the Spark-side plumbing —
binary columns, schema, ``mapInPandas`` batch iteration, partitioning —
is real and tested. Every entry carries a full DuckDB oracle: the
"decode" is deterministic byte arithmetic, so the oracle reproduces it
exactly with hex-sliced byte lists (``list_transform`` + ``list_avg``)
— only the *body* of the pandas UDF is a codec stand-in.
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


# -- typed header metadata (oracle-checked pure columns) ----------------


def mm_typed_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse typed 'header' fields out of the blob with pure column ops
    (hex slicing — the pattern for magic-number/codec/geometry sniffing
    at scan time, before any decode UDF runs) and aggregate by the
    derived 'format'."""
    p = _payloads(spark, sf_dir)
    byte_at = lambda i: F.conv(  # noqa: E731
        F.substring(F.hex("payload"), 2 * i + 1, 2), 16, 10
    ).cast("int")
    meta = p.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        (byte_at(0) % 4).alias("fmt_code"),
        (16 + (byte_at(0) % 64)).alias("width"),
        (16 + (byte_at(1) % 64)).alias("height"),
    )
    return (
        meta.groupBy("fmt_code")
        .agg(
            F.count("*").alias("n_blobs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("fmt_code")
    )


MM_TYPED_META_SQL = """
WITH meta AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         CAST(('0x' || substr(hex(encode(text)), 1, 2))::BIGINT AS INT) AS b0,
         CAST(('0x' || substr(hex(encode(text)), 3, 2))::BIGINT AS INT) AS b1
  FROM documents)
SELECT b0 % 4 AS fmt_code, COUNT(*) AS n_blobs, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(16 + (b0 % 64)) AS min_width, MAX(16 + (b1 % 64)) AS max_height
FROM meta
GROUP BY 1
ORDER BY fmt_code
"""


MM_DECODE_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         ('0x' || substr(hex(encode(text)), 1, 2))::BIGINT AS b0,
         ('0x' || substr(hex(encode(text)), 3, 2))::BIGINT AS b1,
         list_avg(list_transform(range(1, octet_length(encode(text)) + 1),
                  i -> ('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT)) AS mean_byte
  FROM documents)
SELECT CAST(3 AS INT) AS channels,
       COUNT(*) AS n_images,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MIN(16 + (b0 % 64)) AS INT) AS min_width,
       CAST(MAX(16 + (b1 % 64)) AS INT) AS max_height,
       ROUND(AVG(mean_byte), 4) AS avg_mean_byte
FROM b
GROUP BY 1
ORDER BY channels
"""


# -- frame sampling: 1 blob -> N frame rows via mapInPandas -------------

FRAME_BYTES = 64
FRAME_STRIDE = 4  # sample every 4th frame

FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_mean double"


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """FAKE FRAME SAMPLER (no codecs in container): treats the payload
    as a {FRAME_BYTES}-byte-per-frame 'video' and emits every
    {FRAME_STRIDE}th frame — the 1-row-in/N-rows-out fan-out a real
    ffmpeg keyframe sampler has. Swap the slicing for av.decode in a
    real deployment; batch iteration, fan-out schema, and partitioning
    are identical."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_mean": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                frame = payload[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_bytes"].append(len(frame))
                out["frame_mean"].append(float(sum(frame)) / len(frame))
        yield pd.DataFrame(out)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    decoded = _payloads(spark, sf_dir).mapInPandas(sample_frames_batch, FRAMES_SCHEMA)
    return (
        decoded.groupBy("frame_idx")
        .agg(
            F.count("*").alias("n_frames"),
            F.round(F.avg("frame_mean"), 4).alias("avg_frame_mean"),
        )
        .orderBy("frame_idx")
    )


MM_FRAME_SAMPLE_SQL = f"""
WITH bytes AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         list_transform(range(1, octet_length(encode(text)) + 1),
                        i -> ('0x' || substr(hex(encode(text)), 2*i-1, 2))::BIGINT) AS bl
  FROM documents),
frames AS (
  SELECT doc_id, unnest(range(0, n_bytes // {FRAME_BYTES}, {FRAME_STRIDE})) AS fidx, bl
  FROM bytes),
fm AS (
  SELECT CAST(fidx AS INT) AS frame_idx,
         list_avg(bl[fidx*{FRAME_BYTES}+1 : fidx*{FRAME_BYTES}+{FRAME_BYTES}]) AS frame_mean
  FROM frames)
SELECT frame_idx, COUNT(*) AS n_frames, ROUND(AVG(frame_mean), 4) AS avg_frame_mean
FROM fm
GROUP BY 1
ORDER BY frame_idx
"""


QUERIES = {
    "mm_binary_meta": QueryDef(mm_binary_meta, MM_BINARY_META_SQL, "blob metadata, pure columns"),
    "mm_typed_metadata": QueryDef(
        mm_typed_metadata, MM_TYPED_META_SQL, "typed header sniffing + agg"
    ),
    "mm_decode_features": QueryDef(
        mm_decode_features,
        MM_DECODE_FEATURES_SQL,
        "mapInPandas fake-decode pipeline (byte-math oracle)",
    ),
    "mm_frame_sample": QueryDef(
        mm_frame_sample,
        MM_FRAME_SAMPLE_SQL,
        "mapInPandas frame-sampling fan-out (byte-math oracle)",
    ),
}
