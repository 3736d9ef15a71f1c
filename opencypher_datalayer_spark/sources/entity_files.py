"""File-based entity sources: bulk ingest of EGDM entities from JSONL
and CSV into the envelope schema (``model.ENTITY_SCHEMA``), ready for
``GraphStore.apply_batch``.

The reference receives entities one at a time over HTTP
(``layer.go:227``); its repo also carries a CSV fixture shape —
``id,name,age,worksfor`` with ``worksfor`` as a reference column
(``layer_test.go:35-50``, the never-called ``writeSampleCsv``). These
readers are the bulk-file counterpart: fully declarative reads (schema
projection, no driver-side row loop), so a 100 TB entity dump ingests
as a normal distributed scan + the store's merge path.

``_seq`` (the within-batch arrival order that makes a repeated gid
resolve to its LAST occurrence) is file position: JSONL rows and CSV
rows are ordered within a file; across files the (file, offset) pair
is still a total order. A bare ``monotonically_increasing_id`` does
NOT preserve it — Spark packs input splits into partitions
largest-first, so partition indices don't follow file/row order.
``_with_arrival_seq`` instead derives ``_seq`` from deterministic
inputs: ``_metadata.file_path`` + ``_metadata.file_block_start``
identify the split (disjoint in-order byte ranges of each file), a
partition-local window numbers rows inside the split, and per-split
counts (metadata-scale: one row per input split, same cardinality as
Spark's own file listing) prefix-sum into global bases on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opencypher_datalayer_spark.functions.localframe import local_df


def _with_arrival_seq(raw: DataFrame, cols: list[Column]) -> DataFrame:
    """Project ``cols`` from a file-source scan plus an exact ``_seq``
    in (file path, byte offset) order — the distributed zipWithIndex:
    count rows per input split, prefix-sum split bases driver-side,
    then base + in-split row number (a partition-local window; rows of
    one split are contiguous in one task, so ``monotonically_
    increasing_id`` orders correctly *within* it)."""
    tagged = raw.select(
        *cols,
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_block"),
        F.monotonically_increasing_id().alias("_mid"),
    ).persist()
    # The counting job below materializes the cache, so the input files
    # are scanned exactly ONCE; the numbering join then reads the cached
    # partitions. Caching is also what makes the (_file, _block, _mid)
    # keys sound: split sizing and partition packing are decided at
    # materialization, so the counting and numbering jobs can never see
    # different split boundaries (re-planning the scan twice could, if
    # effective parallelism changed between the jobs).
    splits = tagged.groupBy("_file", "_block").count().collect()
    bases, total = [], 0
    for r in sorted(splits, key=lambda r: (r["_file"], r["_block"])):
        bases.append((r["_file"], r["_block"], total))
        total += r["count"]
    base_df = local_df(
        raw.sparkSession, bases, "_file string, _block bigint, _base bigint"
    )
    w = Window.partitionBy("_file", "_block").orderBy("_mid")
    out = (
        tagged.join(F.broadcast(base_df), ["_file", "_block"])
        .withColumn("_seq", (F.col("_base") + F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_file", "_block", "_mid", "_base")
    ).localCheckpoint()  # pin the sequenced batch, then free the intermediate
    tagged.unpersist()
    return out

# JSONL contract: {"id": str, "props": {str: scalar}, "refs": {str: [str]},
# "deleted": bool}; refs values MUST be arrays in the file form (the
# dict-level API in model.normalize_entity is where single-string refs
# are legal and normalized, mirroring neo4j.go:199-208).
_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("refs", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("deleted", T.BooleanType(), True),
    ]
)


def entities_from_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-lines entity dump into the envelope schema."""
    raw = spark.read.schema(_JSONL_SCHEMA).json(path)
    return _with_arrival_seq(
        raw,
        [
            F.col("id"),
            F.coalesce("props", F.create_map().cast("map<string,string>")).alias("props"),
            F.coalesce("refs", F.create_map().cast("map<string,array<string>>")).alias("refs"),
            F.coalesce("deleted", F.lit(False)).alias("deleted"),
        ],
    )


def entities_from_csv(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    ref_cols: tuple[str, ...] = ("worksfor",),
    namespace: str = "",
) -> DataFrame:
    """Read a CSV of entities (reference fixture shape: ``id,name,age,
    worksfor`` — ``layer_test.go:35-50``): every non-id, non-ref column
    becomes a property; ref columns become single-target references.
    ``namespace`` optionally prefixes property/ref keys so downstream
    URI flattening (W9) round-trips."""
    raw = spark.read.option("header", "true").csv(path)
    prop_cols = [c for c in raw.columns if c != id_col and c not in ref_cols]
    ns = namespace.rstrip("/") + "/" if namespace else ""

    props = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(ns + c) for c in prop_cols]),
            F.array(*[F.col(c).cast("string") for c in prop_cols]),
        ),
        lambda k, v: v.isNotNull(),
    )
    present_refs = [
        (F.lit(ns + c), F.when(F.col(c).isNotNull(), F.array(F.col(c).cast("string"))))
        for c in ref_cols
    ]
    refs = F.map_filter(
        F.map_from_arrays(
            F.array(*[k for k, _ in present_refs]),
            F.array(*[v for _, v in present_refs]),
        ),
        lambda k, v: v.isNotNull(),
    )
    return _with_arrival_seq(
        raw,
        [
            F.col(id_col).alias("id"),
            props.alias("props"),
            refs.alias("refs"),
            F.lit(False).alias("deleted"),
        ],
    )
