"""Standing MinHash signature artifact: the persisted per-doc
signature table the LSH family (batch pairs/clusters, streaming
ingest-time filter) probes and extends.

Signatures are a PURE per-doc function of the text
(``operators.minhash.signatures_for``) — no corpus-wide statistic
enters, unlike the n-gram corpus artifact's df ranking. Two
consequences shape this module:

- EXTENSION IS EXACT: appending a new batch's signature rows yields
  byte-identical content to a full rebuild over the grown corpus
  (pinned by ``tests/test_standing_artifacts.py``), so the standing
  table never needs recomputation — O(batch) per ingest, forever.
- NO COMPACT IS NEEDED for correctness or quality: there is no drift
  to repair. (File-count hygiene at very long extension chains is the
  artifact store ``sweep`` + a fresh ``write_minhash_sigs`` commit if
  a deployment ever wants it — deliberately not a special path here.)

The streaming filter (``streaming/neardup.py``) keeps its OWN
epoch-partitioned signature state because it additionally needs
replay-idempotence bookkeeping per micro-batch epoch; this module is
the batch-pipeline shape, where corpus versions advance by explicit
committed extensions.

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
    signatures_for,
)

SIGS = "sigs"


def write_minhash_sigs(
    docs: DataFrame, out_dir: str, family: str = ORACLE_HASH_FAMILY
) -> None:
    """Materialize the signature table for ``docs`` (``doc_id``,
    ``text``) under an artifact version dir."""
    check_family(family)
    signatures_for(docs, family).write.parquet(os.path.join(out_dir, SIGS))


def read_minhash_sigs(spark: SparkSession, adir: str) -> DataFrame:
    """The signature frame of a committed artifact version —
    ``(doc_id, m0..m{H-1}, band0..band{BANDS-1})``."""
    return spark.read.parquet(os.path.join(adir, SIGS))


def extend_minhash_sigs(
    spark: SparkSession,
    store,
    kind: str,
    key: tuple,
    docs_new: DataFrame,
    family: str = ORACLE_HASH_FAMILY,
) -> str:
    """Append a NEW batch's signatures (``docs_new``: ``doc_id``,
    ``text``; doc_ids disjoint from the standing corpus — the caller's
    contract) as a new committed artifact version: the prior version's
    files are hard-linked (``ArtifactStore.commit_extension``) and only
    the batch's signature parquet is written — O(batch) per ingest.
    Content-identical to a full rebuild (module docstring)."""
    check_family(family)

    def build(tmp: str) -> None:
        signatures_for(docs_new, family).write.mode("append").parquet(
            os.path.join(tmp, SIGS)
        )

    return store.commit_extension(kind, key, build)
