"""Standing winnowed-fingerprint artifact: the persisted per-doc
fingerprint table the exact-substring dedup family's candidate join
probes and extends.

Winnowed fingerprints are a PURE per-doc function of the text
(``operators.winnowing.winnow_fingerprints`` — byte-level rolling
hashes, window minima; no corpus statistic enters), the same two
consequences as the MinHash-signature and SimHash artifacts:

- EXTENSION IS EXACT: appending a new batch's fingerprint rows yields
  content identical to a full rebuild over the grown corpus (pinned by
  ``tests/test_standing_artifacts.py``) — O(batch) per ingest, forever.
- NO COMPACT IS NEEDED: there is no drift to repair.

Fingerprint VALUES never reach an emitted row (the consumer verifies
candidates on real L-gram strings — ``dedup_substring_pairs``), so the
artifact is keyed only by the corpus fingerprint and the detection
length L.

Reference anchor: no analog — the reference delegates persistence to
Neo4j (``layer.go:257-265``); part of the engine's
training-data-pipeline extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from opencypher_datalayer_spark.operators.winnowing import winnow_fingerprints

FPS = "fps"


def write_winnow_fps(docs: DataFrame, out_dir: str, min_len: int) -> None:
    """Materialize the fingerprint table for ``docs`` (``doc_id``,
    ``text``; caller applies the ``length(text) >= min_len`` filter so
    the artifact matches the consumer's candidate universe)."""
    winnow_fingerprints(docs, min_len).write.parquet(os.path.join(out_dir, FPS))


def read_winnow_fps(spark: SparkSession, adir: str) -> DataFrame:
    """The fingerprint frame of a committed artifact version —
    ``(doc_id, fp)`` (int64s round-trip parquet bit-for-bit)."""
    return spark.read.parquet(os.path.join(adir, FPS))


def extend_winnow_fps(
    spark: SparkSession,
    store,
    kind: str,
    key: tuple,
    docs_new: DataFrame,
    min_len: int,
) -> str:
    """Append a NEW batch's fingerprints (``docs_new``: ``doc_id``,
    ``text``, doc_ids disjoint from the standing corpus — the caller's
    contract) as a new committed artifact version: the prior version's
    files are hard-linked (``ArtifactStore.commit_extension``) and only
    the batch's fingerprint parquet is written — O(batch) per ingest.
    Content-identical to a full rebuild (module docstring)."""

    def build(tmp: str) -> None:
        winnow_fingerprints(docs_new, min_len).write.mode("append").parquet(
            os.path.join(tmp, FPS)
        )

    return store.commit_extension(kind, key, build)
