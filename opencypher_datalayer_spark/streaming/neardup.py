"""Streaming ingest-time near-duplicate filter.

The operator a training-data pipeline runs at the point of ingest: each
arriving micro-batch of documents is near-dup-checked against everything
already accepted, collapsed within itself, and only the survivors enter
the corpus. The reference layer has no analog (it delegates all
execution to Neo4j, ``layer.go:257-265``); this is the streaming form of
``dedup_incremental`` (new-batch x corpus, never corpus^2).

Semantics (deterministic, fully value-oracled by an unrolled SQL
program in ``benchqueries.dedup``):

1. **Corpus filter** — a batch doc is dropped when it shares >= 1 LSH
   band with ANY previously-accepted doc AND their MinHash signatures
   agree in >= ``agree_r`` of H slots (estimated Jaccard >= agree_r/H).
2. **Within-batch collapse** — the same near-dup relation among the
   remaining batch docs forms a graph; each connected component keeps
   its minimum ``doc_id`` (``operators.components``). A component
   keeps a representative even when two of its members are not directly
   near-dups (the standard per-shard collapse in corpus dedup).
3. Survivors' signatures are appended to the corpus state; survivor
   ``doc_id``s are appended to the kept log.

Invariant: no two accepted docs are ever a near-dup pair — within a
batch an edge implies the same component (one keeper), across batches
the corpus filter rejects.

Scale shape: the state is a parquet table of 13-column int/str
signature rows (~200 B/doc — 20 GB for a 100M-doc corpus), partitioned
by ``epoch``; the per-batch work is two band equi-joins (batch side
broadcast — a micro-batch is small by construction) plus a component
solve over the batch's own near-dup graph. Nothing ever joins
corpus x corpus. Exactly-once under retries: every state write lands in
``epoch=<id>`` subdirs with dynamic partition overwrite, so a replayed
epoch overwrites its own output instead of double-inserting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opencypher_datalayer_spark.functions.localframe import local_df
from opencypher_datalayer_spark.operators import minhash as mh
from opencypher_datalayer_spark.operators.components import (
    connected_components,
    driver_edge_budget,
)

# >= 9 of 12 agreeing slots ~ estimated Jaccard >= 0.75, the same
# operating point the batch near-dup family targets
AGREE_R = 9

_STATE_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType())]
    + [T.StructField(f"m{i}", T.LongType()) for i in range(mh.H)]
    + [T.StructField(f"band{b}", T.StringType()) for b in range(mh.BANDS)]
    + [T.StructField("epoch", T.LongType())]
)

_KEPT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("batch", T.LongType()),
        T.StructField("epoch", T.LongType()),
    ]
)


def _near_dup_pairs(
    left_sig: DataFrame,
    right_sig: DataFrame,
    agree_r: int,
    broadcast_left: bool = False,
) -> DataFrame:
    """Distinct (doc_a from left, doc_b from right) pairs sharing >= 1
    LSH band whose signatures agree in >= agree_r slots. Band candidates
    first (equi-join on the bucket key — never a cross join), then the
    agreement check joins the H-slot signatures back in.

    ``broadcast_left`` pins the left side's BAND ROWS as the band
    join's build side — the batch-vs-corpus shape, where the
    micro-batch is small by construction and the corpus must never
    shuffle. The hint is applied ONLY to that per-doc-bounded explode;
    the candidate-pair frame's row count is collision-dependent (not
    bounded by batch rows), so it is never force-broadcast — AQE still
    broadcasts it at runtime when it turns out small."""
    hint = F.broadcast if broadcast_left else (lambda df: df)
    cand = (
        hint(mh.band_rows(left_sig).withColumnRenamed("doc_id", "doc_a"))
        .join(
            mh.band_rows(right_sig).withColumnRenamed("doc_id", "doc_b"),
            ["band_idx", "band_hash"],
        )
        .select("doc_a", "doc_b")
        .dropDuplicates()
    )
    return (
        cand.join(
            left_sig.select("doc_id", *mh.SIG_COLS).alias("sa"),
            cand.doc_a == F.col("sa.doc_id"),
        )
        .join(
            right_sig.select("doc_id", *mh.SIG_COLS).alias("sb"),
            cand.doc_b == F.col("sb.doc_id"),
        )
        .where(mh.agreement_count("sa", "sb") >= agree_r)
        .select("doc_a", "doc_b")
    )


# What the fused path actually broadcasts is the batch's BAND ROWS
# CARRYING THEIR SIGNATURES (BANDS rows/doc x (id + band key + H int64
# slots) ~ 4 x 200 B = 800 B/doc), so the gate is sized on that — and
# because the broadcast frame is a pure per-doc explode, its size IS
# bounded by batch rows (unlike a candidate-pair frame, whose volume is
# collision-dependent and must never be hinted). Above the gate (a
# replayed mega-batch, not a micro-batch) the hint is withheld and the
# band join degrades to a shuffle join instead of aborting on the
# broadcast limit.
BATCH_BROADCAST_BYTES_PER_DOC = 800
BATCH_BROADCAST_MAX_BYTES = 512 << 20

# max collected pair rows solved by the driver union-find in the fused
# path (rows, not distinct pairs: a pair sharing k bands arrives k times
# and is set-deduped on the driver)
PAIR_COLLECT_BUDGET = 2_000_000

# sigs epoch-partition byte size up to which the kept-log partition is
# written driver-side (pyarrow column read + one-file write) instead of
# a second Spark write job per micro-batch — the bm25 extension's
# EXTEND_DRIVER_STATS_MAX_BYTES idiom; above it the Spark write runs
DRIVER_KEPT_MAX_BYTES = 64 * 1024 * 1024


def _fits_broadcast(n_rows: int) -> bool:
    return n_rows * BATCH_BROADCAST_BYTES_PER_DOC <= BATCH_BROADCAST_MAX_BYTES


def _union_find_min(edges: list[tuple]) -> dict:
    """Pure-driver union-find; returns {doc_id: component_min} for every
    node appearing in ``edges``."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by value: the smaller id stays the root, so the
            # root IS the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def _band_rows_with_sigs(
    sig: DataFrame, prefix: str, extra: tuple[str, ...] = ()
) -> DataFrame:
    """Explode to one row per (doc, band) CARRYING the H signature slots
    (plus ``extra`` passthrough columns) — the fused join's input shape,
    so agreement is computed on the band join's own output row with no
    follow-up signature joins."""
    cols = [F.col(c).alias(f"{prefix}{c}") for c in ("doc_id", *mh.SIG_COLS)]
    return sig.select(
        *cols,
        *extra,
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(b) for b in range(mh.BANDS)]),
                F.array(*[F.col(f"band{b}") for b in range(mh.BANDS)]),
            )
        ).alias("band_idx", "band_hash"),
    )


def _fused_pairs(
    batch_sig: DataFrame,
    flagged: DataFrame,
    agree_r: int,
    hint,
) -> DataFrame:
    """The fused path's single join: batch band rows (with signatures,
    hinted build side) against (corpus UNION batch) band rows, agreement
    and ordering filters applied directly on the joined row. No
    candidate-pair frame is ever a broadcast input — only the per-doc
    bounded batch explode is."""
    left = hint(_band_rows_with_sigs(batch_sig, "a_").withColumnRenamed("a_doc_id", "doc_a"))
    right = _band_rows_with_sigs(flagged, "b_", extra=("is_corpus",)).withColumnRenamed(
        "b_doc_id", "doc_b"
    )
    agree = sum(
        (F.col(f"a_m{i}") == F.col(f"b_m{i}")).cast("int") for i in range(mh.H)
    )
    return (
        left.join(right, ["band_idx", "band_hash"])
        .where(agree >= agree_r)
        .where(F.col("is_corpus") | (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", "is_corpus")
    )


def dedup_batch_against(
    batch_sig: DataFrame,
    corpus_sig: DataFrame | None,
    agree_r: int = AGREE_R,
    batch_rows: int | None = None,
    out: dict | None = None,
) -> DataFrame:
    """One micro-batch step on already-computed signatures: corpus
    filter, then within-batch component collapse. Returns the surviving
    rows of ``batch_sig``. Shared by the streaming sink and the registry
    query. ``batch_rows`` gates the batch-side broadcast hint; when the
    caller does not know it, the hint is WITHHELD (the safe default —
    AQE still broadcasts a genuinely small side at runtime).

    ``out`` (optional dict) is filled with driver-side facts the caller
    can reuse without extra Spark jobs: ``fused=True`` and
    ``n_dropped=<int>`` when the driver union-find path ran — the
    result then equals ``batch_sig`` minus exactly ``n_dropped``
    distinct doc_ids, and its lineage is ``batch_sig`` plus a broadcast
    local id list (NO filter-state read, so it is safe to write twice
    without a checkpoint). The distributed fallback sets
    ``fused=False`` (result lineage includes the corpus state; callers
    must materialize before overwriting state).

    Hot path: ONE fused band join of the batch against (corpus UNION
    batch) with the signatures carried on the band rows, one collect of
    the near-dup pair list (micro-batch pair sets are tiny), and a
    driver union-find — 3 Spark jobs per epoch instead of the ~10 the
    unfused two-pass shape costs (measured 2.4 s -> 0.9 s per epoch at
    sf0.1, all fixed job overhead). Falls back to the distributed
    two-pass shape when the pair list exceeds the driver budget (a
    replayed mega-batch)."""
    small = _fits_broadcast(batch_rows) if batch_rows is not None else False
    hint = F.broadcast if small else (lambda df: df)

    flagged = batch_sig.select("doc_id", *mh.SIG_COLS, *mh.BAND_COLS).withColumn(
        "is_corpus", F.lit(False)
    )
    if corpus_sig is not None:
        flagged = flagged.unionByName(
            corpus_sig.select("doc_id", *mh.SIG_COLS, *mh.BAND_COLS).withColumn(
                "is_corpus", F.lit(True)
            )
        )
    pairs = _fused_pairs(batch_sig, flagged, agree_r, hint)

    # Arrow-collect the pair list; the budget caps the PYTHON-loop
    # union-find (2M rows ~ a few driver seconds, far above any real
    # micro-batch), not the CC operator's numpy budget — past it the
    # distributed two-pass shape takes over
    budget = min(driver_edge_budget(), PAIR_COLLECT_BUDGET)
    pdf = pairs.limit(budget + 1).toPandas()
    if len(pdf) > budget:
        if out is not None:
            out["fused"] = False
        return _dedup_batch_two_pass(batch_sig, corpus_sig, agree_r, small)

    is_corp = pdf["is_corpus"].to_numpy()
    a = pdf["doc_a"].to_numpy()
    b = pdf["doc_b"].to_numpy()
    corpus_dropped = set(a[is_corp].tolist())
    within = {
        (x, y)
        for x, y in zip(a[~is_corp].tolist(), b[~is_corp].tolist())
        if x not in corpus_dropped and y not in corpus_dropped
    }
    labels = _union_find_min(list(within))
    dropped = sorted(corpus_dropped | {x for x, mn in labels.items() if mn < x})
    if out is not None:
        out["fused"] = True
        out["n_dropped"] = len(dropped)
    if not dropped:
        return batch_sig
    spark = batch_sig.sparkSession
    drop_df = local_df(spark, [(d,) for d in dropped], "doc_id long")
    return batch_sig.join(F.broadcast(drop_df), "doc_id", "left_anti")


def _dedup_batch_two_pass(
    batch_sig: DataFrame,
    corpus_sig: DataFrame | None,
    agree_r: int,
    small: bool,
) -> DataFrame:
    """Distributed fallback for over-budget pair volumes: corpus filter
    join, then within-batch pairs, then the adaptive CC operator. This
    path exists precisely for mega-batches, so the dup/dropped id frames
    are NOT force-broadcast — they can be arbitrarily large here, and
    AQE still broadcasts them at runtime when they turn out small."""
    remaining = batch_sig
    if corpus_sig is not None:
        dup_ids = (
            _near_dup_pairs(batch_sig, corpus_sig, agree_r, broadcast_left=small)
            .select(F.col("doc_a").alias("doc_id"))
            .dropDuplicates()
        )
        remaining = batch_sig.join(dup_ids, "doc_id", "left_anti")

    pairs = _near_dup_pairs(remaining, remaining, agree_r).where(
        F.col("doc_a") < F.col("doc_b")
    )
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    dropped = labels.where(F.col("comp") < F.col("id")).select(
        F.col("id").alias("doc_id")
    )
    return remaining.join(dropped, "doc_id", "left_anti")


class StreamingNearDupFilter:
    """``foreachBatch`` sink: near-dup-filter each micro-batch of
    ``(doc_id, text)`` rows against the accumulated survivor corpus.

    State lives under ``state_dir``: ``sigs/`` (survivor signatures,
    partitioned by epoch) and ``kept/`` (survivor doc_ids per epoch).
    Use as ``stream.writeStream.foreachBatch(f.apply)``; after the query
    finishes, ``kept()`` returns the accepted doc set.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        agree_r: int = AGREE_R,
        hash_family: str = mh.ORACLE_HASH_FAMILY,
    ):
        mh.check_family(hash_family)
        self.spark = spark
        self.sigs_dir = os.path.join(state_dir, "sigs")
        self.kept_dir = os.path.join(state_dir, "kept")
        self.agree_r = agree_r
        self.hash_family = hash_family

    def _read_state(self, path: str, schema: T.StructType) -> DataFrame:
        # explicit schema: an epoch that kept nothing writes a dir with
        # no data files, which schema inference cannot read
        return self.spark.read.schema(schema).parquet(path)

    def _recover_compaction(self) -> None:
        """Finish or roll back a compaction interrupted between renames.
        Cases: (a) ``sigs`` missing but ``.old`` present — the crash hit
        after the swap-out; restore the pre-compaction state (compaction
        simply didn't happen). (b) both present — the crash hit before
        cleanup; the swap completed, drop the leftover. Called at every
        state read and at compact() entry, so no crash leaves the filter
        reading an empty corpus or a blocked next compaction."""
        old = self.sigs_dir + ".old"
        if os.path.isdir(old):
            import shutil

            if not os.path.isdir(self.sigs_dir):
                os.rename(old, self.sigs_dir)
            else:
                shutil.rmtree(old)
        tmp = self.sigs_dir + ".compacting"
        if os.path.isdir(tmp):
            import shutil

            shutil.rmtree(tmp)  # incomplete fold output; state is intact

    def corpus_sigs(self, before_epoch: int | None = None) -> DataFrame | None:
        self._recover_compaction()
        if not os.path.isdir(self.sigs_dir):
            return None
        df = self._read_state(self.sigs_dir, _STATE_SCHEMA)
        if before_epoch is not None:
            df = df.where(F.col("epoch") < before_epoch)
        return df.drop("epoch")

    def kept(self) -> DataFrame:
        if not os.path.isdir(self.kept_dir):
            return self.spark.createDataFrame([], _KEPT_SCHEMA)
        return self._read_state(self.kept_dir, _KEPT_SCHEMA)

    def compact(self, below_epoch: int) -> None:
        """Fold signature epochs ``< below_epoch`` into a single base
        partition (``epoch=-1``, visible to all future epochs), bounding
        the partition/file count a long-running stream accumulates.
        Epochs ``>= below_epoch`` keep their own partitions, so a
        foreachBatch retry of any epoch at or above the bound stays
        idempotent — its ``before_epoch`` filter still excludes that
        epoch's own survivors, and its dynamic overwrite still targets
        an intact partition. Pass the checkpoint's committed offset as
        ``below_epoch``; the bound is ENFORCED here rather than left to
        the caller (epochs folded into the base are finalized — the
        standard retention trade). The kept log is untouched.
        Crash-safe: an interruption between the renames is healed by
        ``_recover_compaction`` at the next read or compact (the fold
        either completed or rolls back; live state is never the
        casualty)."""
        self._recover_compaction()
        epoch = F.col("epoch")
        sigs = self._read_state(self.sigs_dir, _STATE_SCHEMA).withColumn(
            "epoch",
            F.when(epoch < int(below_epoch), F.lit(-1).cast("long")).otherwise(epoch),
        )
        tmp = self.sigs_dir + ".compacting"
        sigs.write.mode("overwrite").partitionBy("epoch").parquet(tmp)
        import shutil

        old = self.sigs_dir + ".old"
        os.rename(self.sigs_dir, old)
        os.rename(tmp, self.sigs_dir)
        shutil.rmtree(old)

    def apply(
        self, batch: DataFrame, epoch_id: int
    ) -> tuple[DataFrame, int | None]:
        """Process one micro-batch (the ``foreachBatch`` contract).

        A replayed epoch re-filters against strictly-earlier state and
        overwrites its own ``epoch=<id>`` partitions — idempotent, so
        at-least-once delivery still yields exactly-once state.

        The batch is re-split ahead of the signature stage: a file
        stream hands each micro-batch over as however few files the
        source admitted (often ONE), and the 30x shingle explode would
        then run on one core while the rest idle — measured 73.3 s for
        a single-file 125k-doc epoch at the sf10 rehearsal vs 7.0 s
        re-split. A streaming frame is not a plain file scan, so the
        footer-probing rebalance cannot see its splits; the row-count
        form gates on the count the sink needs anyway (a small batch
        stays un-shuffled)."""
        from opencypher_datalayer_spark.operators.scale import rebalance_rows

        b = batch.select("doc_id", "text")
        n = b.count()
        sig = mh.signatures_for(
            rebalance_rows(b, n, work_per_row=mh.SIGNATURE_WORK_PER_DOC),
            self.hash_family,
        ).localCheckpoint()
        return self.apply_sigs(sig, epoch_id)

    def apply_sigs(
        self, sig: DataFrame, epoch_id: int, batch_rows: int | None = None
    ) -> tuple[DataFrame, int | None]:
        """``apply`` for a batch whose signatures are already computed
        (and materialized — the frame must NOT derive from this
        filter's own state dirs). The registry replay computes
        signatures once for all arrival batches and slices per epoch —
        signatures are a pure per-doc function, so this is observably
        identical to ``apply``; it just avoids one explode+groupBy job
        per epoch. ``batch_rows`` is the exact row count of ``sig``
        when the caller already knows it (one grouped count job for all
        epochs instead of one count per epoch).

        Returns ``(kept, n_kept)``: this epoch's surviving signature
        rows and, when derivable driver-side (the fused union-find
        path), their exact count — so downstream consumers (the
        clean-ingest sink) neither re-read the kept log nor re-count
        the survivors."""
        n_sig = sig.count() if batch_rows is None else int(batch_rows)
        facts: dict = {}
        kept = dedup_batch_against(
            sig,
            self.corpus_sigs(before_epoch=epoch_id),
            self.agree_r,
            batch_rows=n_sig,
            out=facts,
        )
        if facts.get("fused"):
            # fused-path result lineage = materialized ``sig`` + a
            # broadcast local drop list (dedup_batch_against contract):
            # both state writes below can consume it directly — neither
            # re-reads the state this epoch overwrites — so the
            # checkpoint job is pure overhead here
            n_kept: int | None = n_sig - facts["n_dropped"]
        else:
            # distributed fallback: lineage includes the corpus state —
            # materialize before overwriting it (the original contract)
            kept = kept.localCheckpoint()
            n_kept = None
        epoch = F.lit(int(epoch_id)).cast("long")
        (
            kept.withColumn("epoch", epoch)
            .write.mode("overwrite")
            .partitionBy("epoch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.sigs_dir)
        )
        if not self._write_kept_driver_side(epoch_id, n_kept):
            (
                kept.select("doc_id")
                .withColumn("batch", epoch)
                .withColumn("epoch", epoch)
                .write.mode("overwrite")
                .partitionBy("epoch")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self.kept_dir)
            )
        return kept, n_kept

    def _write_kept_driver_side(self, epoch_id: int, n_kept: int | None) -> bool:
        """Write this epoch's kept-log partition with pyarrow on the
        driver, derived from the sigs partition the caller just wrote
        (the kept log is exactly that partition's ``doc_id`` column
        plus constant ``batch``/``epoch``) — one less Spark write job
        per micro-batch, same on-disk layout. Only taken when the
        fused path supplied the exact count (``n_kept``; the
        distributed fallback's kept frame must flow through Spark) and
        the epoch partition is small enough to read driver-side
        (``DRIVER_KEPT_MAX_BYTES`` — the bm25 extension's driver-stats
        gate idiom; a mega-batch falls back to the Spark write).
        Returns True when the partition was written (or there was
        nothing to write — mirroring the dynamic-overwrite no-op on an
        empty frame)."""
        if n_kept is None:
            return False
        if n_kept == 0:
            # dynamic partition overwrite of an empty frame writes no
            # partition dir — mirror that exactly (deterministic replay
            # re-keeps the same rows, so a stale partition cannot occur)
            return True
        sig_part = os.path.join(self.sigs_dir, f"epoch={int(epoch_id)}")
        files = [
            os.path.join(sig_part, f)
            for f in (os.listdir(sig_part) if os.path.isdir(sig_part) else [])
            if f.endswith(".parquet")
        ]
        if not files or sum(os.path.getsize(f) for f in files) > DRIVER_KEPT_MAX_BYTES:
            return False
        import shutil
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = pa.concat_tables(
            pq.read_table(f, columns=["doc_id"]) for f in files
        ).column("doc_id").cast(pa.int64())
        batch = pa.array([int(epoch_id)] * len(ids), pa.int64())
        part = os.path.join(self.kept_dir, f"epoch={int(epoch_id)}")
        if os.path.isdir(part):  # replayed epoch: overwrite, like dynamic mode
            shutil.rmtree(part)
        os.makedirs(part, exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": ids, "batch": batch}),
            os.path.join(
                part, f"part-00000-{uuid.uuid4().hex}-c000.snappy.parquet"
            ),
        )
        return True
