"""Standing BM25 inverted-index artifact: bucket-partitioned postings
plus corpus statistics, probed by the lexical-retrieval family.

Retrieval is the one LLM-pipeline shape the engine lacked: given a
query (a bag of terms — here a whole document, the "find documents
like this one" curation/RAG probe), rank the corpus by Okapi BM25.
The corpus-side derivation (postings, document frequencies, document
lengths, corpus size) is exactly the build-once/probe-per-batch shape
of the dedup/ANN artifacts, so it lives in the same store:

- ``postings/`` — one row per (doc, term): ``(tok, doc_id, tf, dl)``,
  written ``partitionBy(bucket)`` where ``bucket = pmod(xxhash64(tok),
  N_BUCKETS)``. A probe knows its query terms' buckets up front, so the
  scan is PARTITION-PRUNED to those buckets (the IVF-cell idiom applied
  to lexical search); ``dl`` is denormalized onto the row so the probe
  never joins a doc-length table.
- ``stats/`` — ``(tok, df)`` per term, same bucket partitioning. Rows
  are DELTAS: an extension appends the batch's per-term df counts and
  the probe sums df across generations for just the (broadcast-tiny)
  query vocabulary — df is additive across disjoint doc batches, so
  extension is exact, never approximate.
- ``corpus/`` — ``(n_docs, sum_dl)`` delta rows, summed at probe time
  (two scalars; bounded by the number of extensions).

Extension is O(batch): append the batch's postings/stats/corpus rows
through ``ArtifactStore.commit_extension`` (hard-linked base + CAS
publish). Unlike the n-gram corpus there is no ranking to go stale —
df deltas SUM to the exact grown-corpus value — so ``compact`` is pure
housekeeping (merge the stats/corpus generations to keep the probe-side
delta aggregation flat); :func:`needs_compact` is a generation-count
advisory, not a quality trigger.

Scoring (the registry's pinned point, mirrored term-for-term by the
DuckDB oracles): ``score(q,d) = sum over shared terms of idf(t) *
sat(t,d)`` with the RATIONAL idf ``(N - df + 0.5)/(df + 0.5) + 1`` —
the argument of the textbook BM25 log, kept log-free for the same
reason ``textkit.tfidf_topk`` is: every factor is then a
correctly-rounded IEEE op on exact operands, so any engine computes
the identical double (libm ``log`` drifts by ulps across engines).
``sat = tf*(k1+1) / (tf + k1*((1-b) + b*(dl/avgdl)))`` is textbook.
Per-term scores are floored onto an integer 1e-9 grid and SUMMED AS
INT64 — order-independent, so the grouped aggregation hash-matches
bit-for-bit regardless of partial-aggregation order. Callers that
want the log idf pass ``idf="log"`` (rank quality; not oracle-pinned).

Reference anchor: no analog — the reference delegates persistence and
querying to Neo4j (``layer.go:257-265``); this module is part of the
engine's training-data-pipeline extension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.textkit import tokens

N_BUCKETS = 32  # postings/stats partition count; probes prune to the query's buckets
K1 = 1.2
B = 0.75
SCALE = 1_000_000_000  # per-term integer score grid (1e-9)

POSTINGS = "postings"
STATS = "stats"
CORPUS = "corpus"


def bucket_of(tok) -> F.Column:  # type: ignore[name-defined]
    """Partition bucket of a term — any deterministic hash works (the
    oracle never sees buckets; they only drive Spark-side pruning)."""
    return F.pmod(F.xxhash64(tok), F.lit(N_BUCKETS)).cast("int")


# token explode inflates ~64 rows per ~300-char doc (the text family's
# shared estimate) — the builders re-split ahead of it so a single-row-
# group source doesn't serialize the build on one core (the IVF
# quantize/assign trap, found again here: direct-kernel sf10 build was
# 66.9 s vs 20.0 through the pre-rebalanced registry path)
WORK_TOKENIZE = 64


def postings_for(docs: DataFrame) -> DataFrame:
    """``(bucket, tok, doc_id, tf, dl)`` for a ``(doc_id, text)`` frame.
    Pure per-doc content (tf and dl are functions of one document), so
    extension rows are exactly what a full rebuild would emit."""
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation

    docs = rebalance_for_inflation(docs, work_per_row=WORK_TOKENIZE)
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dl = Window.partitionBy("doc_id")
    return tf.withColumn("dl", F.sum("tf").over(dl)).withColumn(
        "bucket", bucket_of(F.col("tok"))
    )


def stats_for(postings: DataFrame) -> DataFrame:
    """``(bucket, tok, df)`` — document frequency per term. Over a
    batch's postings this is the batch's df DELTA (additive across
    disjoint doc batches)."""
    return (
        postings.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn("bucket", bucket_of(F.col("tok")))
    )


def corpus_row(docs: DataFrame, post: DataFrame | None = None) -> DataFrame:
    """One ``(n_docs, sum_dl)`` row for a doc batch. ``n_docs`` counts
    ALL docs (token-less documents still raise N in the idf); sum_dl
    counts whitespace tokens. Pass the batch's ``post`` (postings)
    frame to derive sum_dl from it (``sum(tf)`` — token-less docs add
    nothing either way) instead of re-tokenizing the corpus a second
    time; ``n_docs`` is then a tokenize-free count."""
    if post is not None:
        n = docs.select(F.count("*").alias("n_docs"))
        return n.crossJoin(post.select(F.sum("tf").cast("long").alias("sum_dl")))
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation

    docs = rebalance_for_inflation(docs, work_per_row=WORK_TOKENIZE)
    return docs.select(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("sum_dl"),
    )


def index_meta(adir: str) -> dict:
    """The committed version's ``meta.json`` (``{}`` if absent) —
    streaming sinks stamp their replay marker here, atomically with the
    version commit (the IVF index's exactly-once idiom)."""
    try:
        with open(os.path.join(adir, "meta.json")) as f:
            return json.load(f)
    except OSError:
        return {}


def _write_meta(out_dir: str, meta: dict) -> None:
    p = os.path.join(out_dir, "meta.json")
    if os.path.exists(p):  # hard-linked from the base version: never
        os.remove(p)  # rewrite a shared inode in place
    with open(p, "w") as f:
        json.dump(meta, f)


def write_bm25_index(
    docs: DataFrame, out_dir: str, meta_extra: dict | None = None
) -> None:
    """Materialize the index for ``docs`` (``doc_id``, ``text``) under
    an artifact version dir. The postings lineage is checkpointed once
    — the stats aggregation and corpus row derive from it instead of
    re-running the tokenize/explode per output (a build paid the whole
    pass three times before)."""
    post = postings_for(docs).localCheckpoint()
    post.write.partitionBy("bucket").parquet(os.path.join(out_dir, POSTINGS))
    stats_for(post).write.partitionBy("bucket").parquet(os.path.join(out_dir, STATS))
    corpus_row(docs, post).write.parquet(os.path.join(out_dir, CORPUS))
    _write_meta(out_dir, dict(meta_extra or {}))


# Explicit read schemas: a zero-row build (e.g. every document empty)
# writes parquet dirs with no data files, where schema inference fails
# — the graph store's empty-commit lesson, re-found here by the
# Hypothesis model (tests/test_bm25_properties.py).
_POSTINGS_SCHEMA = "tok string, doc_id bigint, tf bigint, dl bigint, bucket int"
_STATS_SCHEMA = "tok string, df bigint, bucket int"
_CORPUS_SCHEMA = "n_docs bigint, sum_dl bigint"


def read_bm25_index(spark: SparkSession, adir: str) -> dict[str, DataFrame]:
    return {
        POSTINGS: spark.read.schema(_POSTINGS_SCHEMA).parquet(
            os.path.join(adir, POSTINGS)
        ),
        STATS: spark.read.schema(_STATS_SCHEMA).parquet(os.path.join(adir, STATS)),
        CORPUS: spark.read.schema(_CORPUS_SCHEMA).parquet(os.path.join(adir, CORPUS)),
    }


def extend_bm25_index(
    spark: SparkSession,
    store,
    kind: str,
    key: tuple,
    docs_new: DataFrame,
    meta_extra: dict | None = None,
) -> str:
    """Append a NEW batch (doc_ids disjoint from the standing corpus —
    the caller's contract, same as every standing artifact) as a new
    committed version: postings rows are pure per-doc, stats/corpus
    rows are additive deltas the probe sums — content-equivalent to a
    full rebuild over the grown corpus (pinned by
    ``tests/test_bm25.py``). O(batch) per ingest. ``meta_extra``
    merges into the version's ``meta.json`` atomically with the commit
    (streaming replay markers)."""

    def build(tmp: str) -> None:
        post = postings_for(docs_new).localCheckpoint()  # one tokenize pass
        post.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(tmp, POSTINGS)
        )
        stats_for(post).write.mode("append").partitionBy("bucket").parquet(
            os.path.join(tmp, STATS)
        )
        corpus_row(docs_new, post).write.mode("append").parquet(
            os.path.join(tmp, CORPUS)
        )
        _write_meta(tmp, _merged_meta(index_meta(tmp), meta_extra))

    return store.commit_extension(kind, key, build)


def _merged_meta(base_meta: dict, meta_extra: dict | None) -> dict:
    """Merge extension meta onto the base version's, keeping the
    ``last_epoch`` replay marker MONOTONIC: on a commit_extension CAS
    retry the tmp is relinked from the WINNER's version, whose marker
    may already be past this writer's epoch — a plain dict overwrite
    would move the marker backward and reopen the winner's committed
    replay window (double ingest on stream replay)."""
    merged = {**base_meta, **(meta_extra or {})}
    if "last_epoch" in base_meta and "last_epoch" in (meta_extra or {}):
        merged["last_epoch"] = max(
            int(base_meta["last_epoch"]), int(meta_extra["last_epoch"])
        )
    return merged


def generations(spark: SparkSession, adir: str) -> int:
    """How many stats/corpus delta generations the probe must sum —
    one per extension since the last compact (the corpus frame holds
    exactly one row per build/extend batch)."""
    return read_bm25_index(spark, adir)[CORPUS].count()


# Probe-side df aggregation touches #generations x query-vocab rows —
# flat and tiny until the extension chain gets long. Housekeeping
# advisory only: df sums are EXACT at any generation count.
COMPACT_GENERATIONS = 16


def needs_compact(spark: SparkSession, adir: str) -> bool:
    return generations(spark, adir) >= COMPACT_GENERATIONS


def compact_bm25_index(
    spark: SparkSession, store, kind: str, key: tuple, retries: int = 5
) -> str:
    """Merge the stats/corpus delta generations into single rows as a
    new full version. Content-equivalent to the pre-compact index —
    df/corpus sums are associative. Two scale/safety properties:

    - **O(stats), not O(corpus)**: postings content is UNCHANGED by a
      compact (only the delta generations merge), so the base version's
      postings tree is hard-linked into the new version untouched —
      never localCheckpointed or rewritten. Only the (tiny) merged
      stats/ and corpus/ dirs are written.
    - **CAS publish**: the rewrite is derived from a READ of the base
      version, so it publishes via ``store.commit_if_current`` — an
      extension that commits between the read and the publish raises
      :class:`ExtensionConflict` and compact re-reads the NEW current
      and re-merges (a plain ``commit`` would silently erase the
      extension's postings/stats delta and roll its ``last_epoch``
      replay marker back, double-ingesting on stream replay).
    """
    from opencypher_datalayer_spark.operators.artifacts import (
        ExtensionConflict,
        _link_tree,
    )

    for _ in range(retries + 1):
        base = store.current_version(kind, key)
        if base is None:
            raise FileNotFoundError(f"no committed version to compact: {kind} {key!r}")
        cur = store.current_dir(kind, key)
        frames = read_bm25_index(spark, cur)
        stats = (
            frames[STATS].groupBy("tok").agg(F.sum("df").alias("df"))
            .withColumn("bucket", bucket_of(F.col("tok")))
            .localCheckpoint()  # survive the sweep of the old version
        )
        corpus = (
            frames[CORPUS]
            .agg(F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
            .localCheckpoint()
        )
        meta = index_meta(cur)  # carry the replay marker over — compacting
        # mid-stream must never reopen a committed epoch's replay window

        def build(tmp: str) -> None:
            # postings unchanged: share the base version's inodes
            _link_tree(os.path.join(cur, POSTINGS), os.path.join(tmp, POSTINGS))
            stats.write.partitionBy("bucket").parquet(os.path.join(tmp, STATS))
            corpus.write.parquet(os.path.join(tmp, CORPUS))
            _write_meta(tmp, meta)

        try:
            return store.commit_if_current(kind, key, build, base)
        except ExtensionConflict:
            continue  # an extender won: re-read the grown index, re-merge
    raise ExtensionConflict(
        f"compact of {kind} {key!r} lost {retries + 1} consecutive publish races"
    )


def bm25_scores(
    spark: SparkSession,
    adir: str,
    queries: DataFrame,
    k1: float = K1,
    b: float = B,
    idf: str = "rational",
) -> DataFrame:
    """Score every corpus document sharing a term with each query:
    ``(q_id, doc_id, s_int)`` where ``s_int`` is the int64 1e-9-grid
    BM25 sum (divide by 1e9 for the score; rank on s_int — exact).

    ``queries`` is ``(q_id, toks array<string>)``. Plan shape: the
    query side broadcasts (it is a handful of term lists); the postings
    and stats scans are partition-pruned to the query terms' buckets
    (bounded driver collect — at most N_BUCKETS ints); df joins back
    broadcast (rows <= query vocabulary); the only shuffle is the
    final (q_id, doc_id) aggregation, carrying one int64 per matched
    term occurrence. A query of common terms matches most of the
    corpus — that density is inherent to EXACT ranking semantics (the
    impact-ordered/WAND early-exit family trades exactness for skips);
    this is the labeled exact baseline, and it still scans only the
    query's buckets."""
    qt = queries.select(
        "q_id", F.explode(F.array_distinct("toks")).alias("tok")
    ).withColumn("bucket", bucket_of(F.col("tok")))
    buckets = [r[0] for r in qt.select("bucket").distinct().collect()]  # <= N_BUCKETS
    frames = read_bm25_index(spark, adir)
    n_docs, sum_dl = (
        frames[CORPUS].agg(F.sum("n_docs"), F.sum("sum_dl")).collect()[0]
    )
    if not n_docs or not sum_dl:  # empty or token-less corpus: no matches
        return spark.createDataFrame([], "q_id bigint, doc_id bigint, s_int bigint")
    avgdl = float(sum_dl) / float(n_docs)
    dfs = (
        frames[STATS]
        .where(F.col("bucket").isin(buckets))
        .join(F.broadcast(qt.select("tok").distinct()), "tok")
        .groupBy("tok")
        .agg(F.sum("df").alias("df"))  # sum delta generations -> exact df
    )
    matched = (
        frames[POSTINGS]
        .where(F.col("bucket").isin(buckets))
        .join(F.broadcast(qt.select("q_id", "tok")), "tok")
        .join(F.broadcast(dfs), "tok")
    )
    if idf == "rational":
        idf_col = (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (
            F.col("df") + F.lit(0.5)
        ) + F.lit(1.0)
    elif idf == "log":
        idf_col = F.log(
            (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
    else:
        raise ValueError(f"unknown idf variant {idf!r}")
    # parenthesization mirrored by the SQL oracles token-for-token —
    # each op is one correctly-rounded IEEE step on identical operands
    sat = (F.col("tf") * F.lit(1.0 + k1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
    )
    term_i = F.floor(idf_col * sat * F.lit(float(SCALE))).cast("long")
    return (
        matched.withColumn("ti", term_i)
        .groupBy("q_id", "doc_id")
        .agg(F.sum("ti").alias("s_int"))
    )
