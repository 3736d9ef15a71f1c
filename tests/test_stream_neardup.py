"""Streaming ingest-time near-dup filter: the real writeStream wiring,
its equivalence to the deterministic foreachBatch replay the registry
value-oracles, the accepted-set invariant, and retry idempotence."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.dedup import (
    STREAM_NBATCH,
    st_stream_neardup,
)
from opencypher_datalayer_spark.operators import minhash as mh
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.streaming.neardup import (
    AGREE_R,
    StreamingNearDupFilter,
    _near_dup_pairs,
)


def _write_batch_files(spark, sf_dir, out_dir):
    """Materialize documents as one parquet file per arrival batch with
    strictly increasing mtimes, so the file stream source (which orders
    by modification time) replays the registry's batch sequence."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    os.makedirs(out_dir)
    for k in range(STREAM_NBATCH):
        tmp = os.path.join(out_dir, f"_stage{k}")
        docs.where(F.col("doc_id") % STREAM_NBATCH == k).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(out_dir, f"batch{k}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + 600 * k, 1_700_000_000 + 600 * k))
    return docs


def test_stream_equals_replay(spark, sf_dir, tmp_path):
    """A REAL file-source stream (maxFilesPerTrigger=1, availableNow)
    through writeStream.foreachBatch produces exactly the registry
    replay's accepted set — the wiring the oracle cannot drive."""
    docs = _write_batch_files(spark, sf_dir, str(tmp_path / "arrivals"))

    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "arrivals"))
        .writeStream.foreachBatch(filt.apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.doc_id, r.batch) for r in filt.kept().select("doc_id", "batch").collect()
    }
    replayed = {
        (r.doc_id, r.batch)
        for r in st_stream_neardup(spark, sf_dir, hash_family=mh.ORACLE_HASH_FAMILY).collect()
    }
    assert streamed == replayed
    assert streamed  # non-degenerate: the corpus keeps something


def test_accepted_set_is_pairwise_non_dup(spark, sf_dir):
    """The operator's core invariant, independent of batch order: no two
    accepted docs are a near-dup pair (share a band AND agree in >=
    AGREE_R signature slots)."""
    kept = st_stream_neardup(spark, sf_dir, hash_family=mh.ORACLE_HASH_FAMILY)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    kept_sigs = mh.signatures_for(
        docs.join(kept.select("doc_id"), "doc_id", "left_semi"), mh.ORACLE_HASH_FAMILY
    ).localCheckpoint()
    offending = (
        _near_dup_pairs(kept_sigs, kept_sigs, AGREE_R)
        .where(F.col("doc_a") < F.col("doc_b"))
        .count()
    )
    assert offending == 0
    # and it actually filtered: some doc was rejected
    assert kept.count() < docs.count()


def test_replayed_epoch_is_idempotent(spark, sf_dir, tmp_path):
    """At-least-once delivery: re-running an epoch (the foreachBatch
    retry contract) leaves state identical — epoch partitions overwrite
    instead of double-inserting."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    batches = [
        docs.where(F.col("doc_id") % STREAM_NBATCH == k).localCheckpoint()
        for k in range(STREAM_NBATCH)
    ]
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    for k, b in enumerate(batches):
        filt.apply(b, k)
    before = sorted(tuple(r) for r in filt.kept().collect())
    filt.apply(batches[2], 2)  # replay a mid-stream epoch
    after = sorted(tuple(r) for r in filt.kept().collect())
    assert before == after


def test_empty_batch_and_empty_state(spark, tmp_path):
    """An epoch that keeps nothing still commits (readable empty state),
    and kept() on a never-run filter is an empty typed frame."""
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    assert filt.kept().count() == 0
    empty = spark.createDataFrame([], "doc_id long, text string")
    filt.apply(empty, 0)
    assert filt.kept().count() == 0
    assert filt.corpus_sigs() is not None  # state dir exists and reads


def test_rejects_unknown_hash_family(spark, tmp_path):
    with pytest.raises(ValueError):
        StreamingNearDupFilter(spark, str(tmp_path), hash_family="sha1")


def test_compact_preserves_filtering(spark, sf_dir, tmp_path):
    """Compacting the signature state (epoch partitions -> one base)
    changes nothing observable: the kept log survives and the next
    epoch still filters against the full corpus."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    first = docs.where(F.col("doc_id") % 2 == 0).localCheckpoint()
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    filt.apply(first, 0)
    kept_before = sorted(r.doc_id for r in filt.kept().collect())
    corpus_before = filt.corpus_sigs().count()

    filt.compact(below_epoch=1)
    assert sorted(r.doc_id for r in filt.kept().collect()) == kept_before
    assert filt.corpus_sigs().count() == corpus_before

    # replaying the SAME docs as a later epoch: every one is now a
    # corpus dup (agreement 12/12 with itself), so nothing survives
    filt.apply(first, 1)
    assert filt.kept().where(F.col("batch") == 1).count() == 0


def test_broadcast_gate_math():
    from opencypher_datalayer_spark.streaming.neardup import (
        BATCH_BROADCAST_BYTES_PER_DOC,
        BATCH_BROADCAST_MAX_BYTES,
        _fits_broadcast,
    )

    assert _fits_broadcast(1000)
    assert not _fits_broadcast(
        BATCH_BROADCAST_MAX_BYTES // BATCH_BROADCAST_BYTES_PER_DOC + 1
    )


def test_two_pass_fallback_matches_fused(spark, sf_dir, tmp_path, monkeypatch):
    """The distributed fallback (the 100 TB path for a replayed
    mega-batch) must produce exactly the fused path's survivors. Forced
    by shrinking the pair-collect budget below the corpus' pair count."""
    import opencypher_datalayer_spark.streaming.neardup as nd

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    first = docs.where(F.col("doc_id") % 2 == 0).localCheckpoint()
    second = docs.where(F.col("doc_id") % 2 == 1).localCheckpoint()

    def run(state):
        filt = StreamingNearDupFilter(spark, str(tmp_path / state))
        filt.apply(first, 0)
        filt.apply(second, 1)
        return sorted(tuple(r) for r in filt.kept().collect())

    fused = run("fused")
    monkeypatch.setattr(nd, "PAIR_COLLECT_BUDGET", 0)
    fallback = run("fallback")
    assert fallback == fused


def test_corpus_join_broadcasts_batch_side(spark, sf_dir, tmp_path):
    """Plan audit of the FUSED band join itself (dedup_batch_against
    executes it eagerly, so its plan must be inspected pre-collect): the
    batch side is the broadcast build side — the corpus never shuffles
    or sorts for the join."""
    import io
    from contextlib import redirect_stdout

    from opencypher_datalayer_spark.streaming.neardup import AGREE_R, _fused_pairs

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    sig = mh.signatures_for(docs, mh.ORACLE_HASH_FAMILY).localCheckpoint()
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    filt.apply_sigs(sig.where(F.col("doc_id") % 2 == 0), 0)

    batch = sig.where(F.col("doc_id") % 2 == 1)
    flagged = batch.withColumn("is_corpus", F.lit(False)).unionByName(
        filt.corpus_sigs(before_epoch=1).withColumn("is_corpus", F.lit(True))
    )
    pairs = _fused_pairs(batch, flagged, AGREE_R, F.broadcast)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pairs.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # and the end-to-end step still returns the right survivors when
    # the hint is gated on the real batch size
    from opencypher_datalayer_spark.streaming.neardup import dedup_batch_against

    kept = dedup_batch_against(
        batch, filt.corpus_sigs(before_epoch=1), batch_rows=batch.count()
    )
    assert 0 < kept.count() <= batch.count()


def test_compaction_crash_recovery(spark, sf_dir, tmp_path):
    """A compaction interrupted between renames must heal at the next
    read: swap-out crash (sigs gone, .old present) rolls back; cleanup
    crash (both present) completes. Live state is never the casualty."""
    import os
    import shutil as sh

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    filt.apply(docs.where(F.col("doc_id") % 2 == 0).localCheckpoint(), 0)
    n = filt.corpus_sigs().count()

    # simulate: crash AFTER rename(sigs -> old), BEFORE rename(tmp -> sigs)
    os.rename(filt.sigs_dir, filt.sigs_dir + ".old")
    os.makedirs(filt.sigs_dir + ".compacting")
    assert filt.corpus_sigs().count() == n  # rolled back, nothing lost
    assert not os.path.exists(filt.sigs_dir + ".old")
    assert not os.path.exists(filt.sigs_dir + ".compacting")

    # simulate: crash AFTER the swap, BEFORE rmtree(old)
    sh.copytree(filt.sigs_dir, filt.sigs_dir + ".old")
    assert filt.corpus_sigs().count() == n  # completed, leftover dropped
    assert not os.path.exists(filt.sigs_dir + ".old")
    filt.compact(below_epoch=1)  # and a fresh compact still works afterwards
    assert filt.corpus_sigs().count() == n


def test_compact_respects_retry_window(spark, sf_dir, tmp_path):
    """compact(below_epoch) must fold ONLY finalized epochs: an epoch at
    or above the bound keeps its own partition, so a foreachBatch retry
    of that epoch after compaction is still idempotent (its
    before_epoch filter excludes its own survivors). Folding everything
    would make the retried batch match itself and keep nothing."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    batches = [
        docs.where(F.col("doc_id") % STREAM_NBATCH == k).localCheckpoint()
        for k in range(STREAM_NBATCH)
    ]
    filt = StreamingNearDupFilter(spark, str(tmp_path / "state"))
    for k, b in enumerate(batches):
        filt.apply(b, k)
    before = sorted(tuple(r) for r in filt.kept().collect())

    # checkpoint has committed through epoch 2; epoch 3 may still replay
    last = STREAM_NBATCH - 1
    filt.compact(below_epoch=last)
    epochs = {
        r.epoch
        for r in spark.read.parquet(filt.sigs_dir).select("epoch").distinct().collect()
    }
    assert epochs == {-1, last}  # old epochs folded, retry window intact

    filt.apply(batches[last], last)  # the retry the bound protects
    after = sorted(tuple(r) for r in filt.kept().collect())
    assert before == after
