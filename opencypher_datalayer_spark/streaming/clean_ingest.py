"""Streaming clean ingest: the full curation pipeline as ONE
``foreachBatch`` sink — quality gate, near-dup gate, and standing
BM25 inverted-index extension per micro-batch.

This is the composed deployment shape of the engine's text side, the
way ``streaming.vector_ingest`` is the vector side's: a 100 TB daily
pipeline does not run quality filters, dedup, and index maintenance as
three separate jobs over the same bytes — documents arrive once, the
gates run in sequence on the micro-batch, and only the survivors touch
the standing artifacts.

Per micro-batch (``apply(batch, epoch_id)``):

1. **Quality gate** — ``textkit.quality_floor`` (stateless column
   expressions; rejected rows never reach the stateful stages).
2. **Near-dup gate** — :class:`streaming.neardup.StreamingNearDupFilter`
   ``apply`` over the quality-passing rows: MinHash-LSH against the
   accumulated survivor corpus plus within-batch component collapse,
   epoch-partitioned idempotent state.
3. **Index extension** — this epoch's accepted docs extend the
   standing BM25 index (``extend_bm25_index`` — hard-linked O(batch)
   CAS commit). Epoch 0 commits the initial build.

Exactly-once under foreachBatch retries: the near-dup filter's state
is epoch-partitioned-idempotent by construction, and the index
extension stamps ``last_epoch`` into the committed version's
``meta.json`` atomically with the commit (the
``streaming.vector_ingest`` idiom) — a replayed epoch sees
``last_epoch >= epoch_id`` on CURRENT and no-ops, and
``compact_bm25_index`` carries the marker over.

Reference anchor: the reference delegates persistence to Neo4j and has
no streaming or text surface (``layer.go:257-265``); this sink is part
of the engine's training-data-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators import minhash as mh
from opencypher_datalayer_spark.operators.bm25_index import (
    compact_signal,
    extend_bm25_index,
    index_meta,
    maintain_bm25_index,
    write_bm25_index,
)
from opencypher_datalayer_spark.operators.textkit import quality_floor
from opencypher_datalayer_spark.streaming.neardup import StreamingNearDupFilter


class StreamingCleanIngest:
    """``foreachBatch`` sink for ``(doc_id, text)`` micro-batches.

    ``store``/``kind``/``key`` name the standing BM25 artifact the
    survivors extend; ``state_dir`` holds the near-dup filter's state.
    After the stream, :meth:`kept` returns the accepted doc set and
    :meth:`index_dir` the extended index's current version.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        store,
        kind: str,
        key: tuple,
        min_tokens: int,
        min_alpha: float,
        hash_family: str = mh.ORACLE_HASH_FAMILY,
    ):
        self.spark = spark
        self.store = store
        self.kind = kind
        self.key = key
        self.min_tokens = min_tokens
        self.min_alpha = min_alpha
        self.filter = StreamingNearDupFilter(
            spark, state_dir, hash_family=hash_family
        )
        # advisory probe-cost signal of the LAST committed epoch
        # (bm25_index.compact_signal — the measured generation-growth
        # trigger); a deployment polls this to schedule the offline
        # compact_bm25_index merge instead of discovering the drift in
        # its probe latency (the vector sink's idiom). O(1): the
        # builders stamp generation counters into meta.json, so the
        # refresh is a meta read — NO Spark job in the epoch hot path
        # (the eager corpus count here was r12's one bench regression).
        self.last_compact_signal: dict | None = None

    def apply(self, batch: DataFrame, epoch_id: int) -> None:
        # Replay guard FIRST: the marker commits strictly after the
        # filter's epoch state each pass, so last_epoch >= epoch_id
        # implies the filter state is committed too — skipping the
        # whole pass (not just the extension) is safe and saves the
        # MinHash recompute on every replayed micro-batch.
        cur = self.store.current_dir(self.kind, self.key)
        if cur is not None and int(index_meta(cur).get("last_epoch", -1)) >= int(
            epoch_id
        ):
            return  # foreachBatch replay of a committed epoch: no-op
        clean = batch.where(quality_floor(self.min_tokens, self.min_alpha))
        kept_now, n_kept = self.filter.apply(clean, epoch_id)
        self._ingest_survivors(batch, kept_now, n_kept, epoch_id, cur)

    def apply_sigs(
        self,
        batch: DataFrame,
        sig: DataFrame,
        epoch_id: int,
        batch_rows: int | None = None,
    ) -> None:
        """``apply`` for a micro-batch whose QUALITY-PASSING rows'
        MinHash signatures are already computed and materialized:
        ``sig`` must equal ``signatures_for(batch.where(quality_floor(
        min_tokens, min_alpha)), hash_family)`` — both the gate and the
        signatures are pure per-doc functions, so precomputing them
        once for a deterministic replay and slicing per epoch is
        observably identical to ``apply`` (the
        ``StreamingNearDupFilter.apply_sigs`` idiom, pinned equivalent
        by ``tests/test_stream_clean_ingest.py``); it just avoids one
        quality-count and one signature explode+groupBy job chain per
        epoch. ``batch_rows`` is ``sig``'s exact row count when the
        caller knows it (one grouped count job for every epoch)."""
        cur = self.store.current_dir(self.kind, self.key)
        if cur is not None and int(index_meta(cur).get("last_epoch", -1)) >= int(
            epoch_id
        ):
            return  # foreachBatch replay of a committed epoch: no-op
        kept_now, n_kept = self.filter.apply_sigs(
            sig, epoch_id, batch_rows=batch_rows
        )
        self._ingest_survivors(batch, kept_now, n_kept, epoch_id, cur)

    def _ingest_survivors(
        self,
        batch: DataFrame,
        kept_now: DataFrame,
        n_kept: int | None,
        epoch_id: int,
        cur: str | None,
    ) -> None:
        # left-semi against the batch (never a collected id list — a
        # clean batch can be batch-sized) using the kept frame the
        # filter just returned (its lineage never reads the state this
        # epoch wrote — no kept-log re-read job)
        survivors = batch.join(kept_now.select("doc_id"), "doc_id", "left_semi")
        from opencypher_datalayer_spark.operators.bm25_index import WORK_TOKENIZE
        from opencypher_datalayer_spark.operators.scale import rebalance_rows

        if n_kept is not None:
            # fused filter path: survivor count is driver-side fact and
            # the index write below is the frame's ONLY action (both
            # builders are count-job-free given n_docs), so the
            # localCheckpoint the old shape paid here was one pure
            # overhead job per epoch — the kept frame's lineage is the
            # caller-materialized sig plus a broadcast drop list, never
            # the state this epoch overwrites
            n_surv = n_kept
        else:
            # distributed fallback: pay the checkpoint (the extension
            # write must not re-run the filter chain twice) + count
            survivors = survivors.localCheckpoint()
            n_surv = survivors.count()
        # a file-source micro-batch arrives as ONE split with no file
        # layout for the builders' rebalance probe to see — re-split
        # here ahead of the token explode (the neardup sink's
        # rebalance_rows lesson)
        survivors = rebalance_rows(survivors, n_surv, work_per_row=WORK_TOKENIZE)
        marker = {"last_epoch": int(epoch_id)}
        if cur is None:
            self.store.commit(
                self.kind,
                self.key,
                lambda tmp: write_bm25_index(
                    survivors, tmp, meta_extra=marker, n_docs=n_surv
                ),
            )
        else:
            extend_bm25_index(
                self.spark,
                self.store,
                self.kind,
                self.key,
                survivors,
                meta_extra=marker,
                n_docs=n_surv,  # already counted for the re-split above
            )
        self.last_compact_signal = self.compact_signal()

    def compact_signal(self) -> dict | None:
        """``bm25_index.compact_signal`` of the CURRENT index version
        (None before the first commit). Also refreshed automatically
        after every committed epoch into ``last_compact_signal`` —
        O(1) meta-counter read, never a Spark job."""
        cur = self.store.current_dir(self.kind, self.key)
        return None if cur is None else compact_signal(self.spark, cur)

    def maintain_if_due(self) -> dict | None:
        """Run whatever maintenance the advisory recommends
        (``bm25_index.maintain_bm25_index``: postings full-merge past
        the measured 32-generation cliff, else the O(stats) delta
        compact past 16) and return the pre-maintenance signal. The
        deployment's poll loop calls this BETWEEN epochs — probe
        latency then stays flat through arbitrarily long extension
        chains without manual intervention (the r12 cliff:
        flat <=16 generations, +78% at 32)."""
        return maintain_bm25_index(self.spark, self.store, self.kind, self.key)

    def kept(self) -> DataFrame:
        return self.filter.kept()

    def index_dir(self) -> str | None:
        return self.store.current_dir(self.kind, self.key)
