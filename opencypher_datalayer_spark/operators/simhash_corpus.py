"""Standing SimHash fingerprint artifact: the persisted per-doc
fingerprint table the Hamming-radius dedup family probes and extends.

Fingerprints are a PURE per-doc function of the text
(``operators.simhash.fingerprints_for``) — no corpus-wide statistic
enters — the same two consequences as the MinHash signature artifact
(``operators.minhash_corpus``):

- EXTENSION IS EXACT: appending a new batch's fingerprint rows yields
  content identical to a full rebuild over the grown corpus (pinned by
  ``tests/test_standing_artifacts.py``), so the standing table never
  needs recomputation — O(batch) per ingest, forever.
- NO COMPACT IS NEEDED for correctness or quality: there is no drift
  to repair.

Reference anchor: no analog — the reference delegates persistence to
Neo4j (``layer.go:257-265``); this is part of the engine's
training-data-pipeline extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from opencypher_datalayer_spark.operators.minhash import (
    ORACLE_HASH_FAMILY,
    check_family,
)
from opencypher_datalayer_spark.operators.simhash import fingerprints_for

FPS = "fps"


def write_simhash_fps(
    docs: DataFrame, out_dir: str, family: str = ORACLE_HASH_FAMILY
) -> None:
    """Materialize the fingerprint table for ``docs`` (``doc_id``,
    ``text``) under an artifact version dir."""
    check_family(family)
    fingerprints_for(docs, family).write.parquet(os.path.join(out_dir, FPS))


def read_simhash_fps(spark: SparkSession, adir: str) -> DataFrame:
    """The fingerprint frame of a committed artifact version —
    ``(doc_id, simhash)`` (int64s round-trip parquet bit-for-bit)."""
    return spark.read.parquet(os.path.join(adir, FPS))


def extend_simhash_fps(
    spark: SparkSession,
    store,
    kind: str,
    key: tuple,
    docs_new: DataFrame,
    family: str = ORACLE_HASH_FAMILY,
) -> str:
    """Append a NEW batch's fingerprints (``docs_new``: ``doc_id``,
    ``text``; doc_ids disjoint from the standing corpus — the caller's
    contract) as a new committed artifact version: the prior version's
    files are hard-linked (``ArtifactStore.commit_extension``) and only
    the batch's fingerprint parquet is written — O(batch) per ingest.
    Content-identical to a full rebuild (module docstring)."""
    check_family(family)

    def build(tmp: str) -> None:
        fingerprints_for(docs_new, family).write.mode("append").parquet(
            os.path.join(tmp, FPS)
        )

    return store.commit_extension(kind, key, build)
