"""Training-data curation operators over ``documents``: Gopher-style
repetition quality, epoch-weighted mixture upsampling, and benchmark
decontamination (cross-set n-gram overlap).

All three are standard large-corpus pipeline stages (repetition filters
and mixture weights per Rae et al. 2021 "Scaling Language Models"
(Gopher) §A1.1 and the usual pretraining-mix recipes; decontamination
per Brown et al. 2020 (GPT-3) §C). Spark-first shapes: n-gram explodes
feed map-side-combinable counts keyed by ``doc_id``; the eval side of
decontamination is broadcast (it is always tiny next to the training
corpus); upsampling is a pure column expression with a deterministic
hash in place of RNG, so results are reproducible across engines, runs,
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.sources.tables import load_table


def _tokens(col) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def _grams(toks: Column, n: int) -> Column:
    """Token n-grams as strings; empty array when the doc is shorter than
    ``n`` (guarded: Spark's ``sequence`` would otherwise count DOWN for
    stop < start)."""
    if n == 1:
        return toks
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(1, n + 1)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram),
    ).otherwise(F.array().cast("array<string>"))


def _duck_toks(expr: str = "text") -> str:
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), x -> x <> '')"


def _duck_grams(n: int) -> str:
    """DuckDB mirror of ``_grams`` over a ``toks`` column (1-based list
    indexing; ``range(1, len - n + 2)`` enumerates gram starts)."""
    if n == 1:
        return "toks"
    join = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN length(toks) >= {n} "
        f"THEN list_transform(range(1, length(toks) - {n} + 2), i -> {join}) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


# -- repetition quality (Gopher-style) ----------------------------------

# thresholds chosen to split the synthetic corpus; the operator shape is
# the point — swap thresholds per corpus
TOP_BIGRAM_MAX = 0.08
DUP_TRIGRAM_MAX = 0.02


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition stats: most-frequent-unigram token share,
    most-frequent-bigram token share, duplicate-trigram share, and the
    resulting keep/drop flag.

    Each n-gram order is one explode -> count -> per-doc aggregate —
    partial aggregation combines map-side, the only shuffles are on
    ``(doc_id, gram)`` then ``doc_id``, and the three aggregates join
    co-partitioned on ``doc_id``. No all-pairs anything: cost is linear
    in corpus tokens at any scale.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))

    def stats(n: int, top_alias: str, total_alias: str, distinct_alias: str) -> DataFrame:
        return (
            toks.select("doc_id", F.explode(_grams(F.col("toks"), n)).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("doc_id")
            .agg(
                F.max("c").alias(top_alias),
                F.sum("c").alias(total_alias),
                F.count("*").alias(distinct_alias),
            )
        )

    uni = stats(1, "top_uni", "n_tokens", "n_uni")
    bi = stats(2, "top_bi", "n_bi", "n_bi_distinct")
    tri = stats(3, "top_tri", "n_tri", "n_tri_distinct")
    top_bigram_frac = F.when(
        F.col("n_tokens") > 0, F.col("top_bi") * 2.0 / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    dup_trigram_frac = F.when(
        F.col("n_tri") > 0,
        (F.col("n_tri") - F.col("n_tri_distinct")).cast("double") / F.col("n_tri"),
    ).otherwise(F.lit(0.0))
    return (
        uni.join(bi, "doc_id", "left")
        .join(tri, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("top_uni").cast("double") / F.col("n_tokens")).alias("top_unigram_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            dup_trigram_frac.alias("dup_trigram_frac"),
            (
                (top_bigram_frac <= TOP_BIGRAM_MAX) & (dup_trigram_frac <= DUP_TRIGRAM_MAX)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = f"""
WITH t AS (
  SELECT doc_id, {_duck_toks()} AS toks FROM documents),
uni AS (
  SELECT doc_id, max(c) AS top_uni, CAST(sum(c) AS BIGINT) AS n_tokens
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS g FROM t) GROUP BY doc_id, g)
  GROUP BY doc_id),
bi AS (
  SELECT doc_id, max(c) AS top_bi
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_duck_grams(2)}) AS g FROM t) GROUP BY doc_id, g)
  GROUP BY doc_id),
tri AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri, count(*) AS n_tri_distinct
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id, unnest({_duck_grams(3)}) AS g FROM t) GROUP BY doc_id, g)
  GROUP BY doc_id),
j AS (
  SELECT uni.doc_id, n_tokens,
         CAST(top_uni AS DOUBLE) / n_tokens AS top_unigram_frac,
         CASE WHEN n_tokens > 0 THEN top_bi * 2.0 / n_tokens ELSE 0.0 END AS top_bigram_frac,
         CASE WHEN n_tri > 0 THEN CAST(n_tri - n_tri_distinct AS DOUBLE) / n_tri
              ELSE 0.0 END AS dup_trigram_frac
  FROM uni LEFT JOIN bi USING (doc_id) LEFT JOIN tri USING (doc_id))
SELECT doc_id, n_tokens, top_unigram_frac, top_bigram_frac, dup_trigram_frac,
       (top_bigram_frac <= {TOP_BIGRAM_MAX} AND dup_trigram_frac <= {DUP_TRIGRAM_MAX})
         AS keep
FROM j ORDER BY doc_id
"""


# -- epoch-weighted mixture upsampling ----------------------------------

# per-language epoch weights, percent: 220 => 2 full copies + a 20%
# chance of a third; 40 => 40% chance of one copy
MIX_WEIGHTS = {"en": 40, "de": 130, "es": 100, "fr": 220, "zh": 75}


def text_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize a training mixture: each doc appears ``floor(w/100)``
    times plus one more with probability ``(w mod 100)%``, where ``w`` is
    its language's epoch weight. The fractional copy is decided by a
    deterministic md5 threshold (no RNG — reproducible across engines and
    partitionings, the same trick as ``text_stratified_sample``).
    Pure column expressions + one explode; embarrassingly parallel.
    """
    docs = load_table(spark, "documents", sf_dir)
    w = F.coalesce(
        F.create_map(*[F.lit(x) for kv in MIX_WEIGHTS.items() for x in kv])[F.col("lang")],
        F.lit(100),
    )
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    n_copies = (w / F.lit(100)).cast("int") + (h % 100 < w % 100).cast("int")
    return (
        docs.select("doc_id", "lang", n_copies.alias("n_copies"))
        .where(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            "n_copies",
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_idx"),
        )
        .select(
            "doc_id", "lang", "n_copies", F.col("copy_idx").cast("int").alias("copy_idx")
        )
        .orderBy("doc_id", "copy_idx")
    )


_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items())
    + " ELSE 100 END"
)

TEXT_MIXTURE_SQL = f"""
WITH w AS (
  SELECT doc_id, lang, {_MIX_CASE} AS w,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents),
c AS (
  SELECT doc_id, lang,
         CAST(w // 100 + CASE WHEN h % 100 < w % 100 THEN 1 ELSE 0 END AS INTEGER)
           AS n_copies
  FROM w)
SELECT doc_id, lang, n_copies, CAST(unnest(range(0, n_copies)) AS INTEGER) AS copy_idx
FROM c WHERE n_copies > 0
ORDER BY doc_id, copy_idx
"""


# -- benchmark decontamination ------------------------------------------

DECON_N = 8  # token n-gram length for overlap detection
EVAL_SRC = "src0"  # the held-out benchmark slice of the corpus


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find training docs sharing any ``DECON_N``-gram with the eval set
    (``source = EVAL_SRC``) — the GPT-3-style decontamination scan run
    before training. Returns one row per contaminated training doc with
    the distinct shared-gram and matched-eval-doc counts.

    Scale shape: both sides explode to DISTINCT ``(doc, gram)`` pairs;
    the eval side is a benchmark suite (tiny vs a 100 TB training
    corpus), so it is broadcast and the probe never shuffles the
    training side — then one ``doc_id`` aggregation.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "source", _tokens(F.col("text")).alias("toks")
    )

    def gram_pairs(side: DataFrame) -> DataFrame:
        return side.select(
            "doc_id", F.explode(_grams(F.col("toks"), DECON_N)).alias("g")
        ).dropDuplicates(["doc_id", "g"])

    ev = gram_pairs(toks.where(F.col("source") == EVAL_SRC)).withColumnRenamed(
        "doc_id", "eval_doc"
    )
    train = gram_pairs(toks.where(F.col("source") != EVAL_SRC))
    return (
        train.join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("g").alias("n_shared_grams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


TEXT_DECONTAMINATE_SQL = f"""
WITH t AS (
  SELECT doc_id, source, {_duck_toks()} AS toks FROM documents),
g AS (
  SELECT DISTINCT doc_id, source, unnest({_duck_grams(DECON_N)}) AS g FROM t)
SELECT tr.doc_id,
       count(DISTINCT tr.g) AS n_shared_grams,
       count(DISTINCT ev.doc_id) AS n_eval_docs
FROM g tr JOIN g ev ON tr.g = ev.g
WHERE tr.source <> '{EVAL_SRC}' AND ev.source = '{EVAL_SRC}'
GROUP BY tr.doc_id
ORDER BY tr.doc_id
"""


# -- deterministic negative sampling ------------------------------------

NEG_K = 4  # negatives kept per document
NEG_OVERSAMPLE = 4  # extra candidates to absorb self-hits / misses


def text_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{NEG_K} pseudo-random negative documents per document for
    contrastive training — deterministic (hash-derived, no RNG), so the
    pairing is reproducible across engines, runs, and partitionings.

    Candidate ``i`` for a doc is ``md5(doc_id || '#' || i) mod N``,
    semi-joined against the real id set (drops misses on sparse id
    domains), self-pairs excluded, then the first {NEG_K} surviving
    candidates by ``i`` are kept. No global sort or index: candidate
    generation is a pure column explode and the validity check is one
    equi-join on the id."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    n_docs = docs.agg(F.count("*").alias("n_corpus"))
    cand_i = F.explode(
        F.sequence(F.lit(0), F.lit(NEG_K + NEG_OVERSAMPLE - 1))
    ).alias("i")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("#"), F.col("i").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    cands = (
        docs.crossJoin(F.broadcast(n_docs))
        .select("doc_id", "n_corpus", cand_i)
        .withColumn("cand", h % F.col("n_corpus"))
        .where(F.col("cand") != F.col("doc_id"))
        .join(
            docs.select(F.col("doc_id").alias("cand")).dropDuplicates(), "cand"
        )
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    return (
        cands.withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("neg_rank") <= NEG_K)
        .select("doc_id", F.col("cand").alias("neg_doc_id"), "neg_rank")
        .orderBy("doc_id", "neg_rank")
    )


TEXT_NEGATIVES_SQL = f"""
WITH ids AS (SELECT doc_id FROM documents),
n AS (SELECT COUNT(*) AS n_corpus FROM ids),
cands AS (
  SELECT ids.doc_id, t.i,
         ('0x' || substr(md5(CAST(ids.doc_id AS VARCHAR) || '#'
                             || CAST(t.i AS VARCHAR)), 1, 15))::BIGINT
           % n.n_corpus AS cand
  FROM ids, n, unnest(range(0, {NEG_K + NEG_OVERSAMPLE})) AS t(i)),
valid AS (
  SELECT c.doc_id, c.i, c.cand
  FROM cands c JOIN ids r ON c.cand = r.doc_id
  WHERE c.cand <> c.doc_id)
SELECT doc_id, cand AS neg_doc_id, CAST(neg_rank AS BIGINT) AS neg_rank FROM (
  SELECT doc_id, i, cand,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS neg_rank
  FROM valid)
WHERE neg_rank <= {NEG_K}
ORDER BY doc_id, neg_rank
"""


# -- the curation product: per-doc keep/drop verdict --------------------

# Quality floor for the composed verdict — pinned where the driver
# corpus actually has a tail (5th-pct token count is 16; min alpha
# ratio 0.794), so the reason fires on real rows at every test scale.
CLEAN_MIN_TOKENS = 16
CLEAN_MIN_ALPHA = 0.8


def text_clean_corpus(
    spark: SparkSession, sf_dir: str, hash_family: str | None = None
) -> DataFrame:
    """The materialized keep/drop table a curation pipeline actually
    ships: every document with its near-dup cluster and ONE verdict —
    ``exact_dup`` (not the md5-group keeper), else ``near_dup`` (not
    its MinHash-LSH cluster keeper, ``dedup_clusters`` semantics),
    else ``low_quality`` (token count or alpha ratio below the pinned
    floor — the floor applies to keepers too, as in a real pipeline),
    else ``kept``. Composes three independently-verified families
    (exact hash-groupBy dedup, LSH + connected components, per-doc
    quality expressions) into the end product; the oracle recomputes
    the whole composition, so the hash match checks the PRECEDENCE
    logic, not just the parts.

    Scale shape: the cluster side is ``dedup_clusters``'s (standing
    MinHash signatures, recursive components on the slim pair list);
    the exact-dup and quality sides are one hash-groupBy and a
    map-only pass — nothing new shuffles beyond the parts."""
    from opencypher_datalayer_spark.benchqueries.dedup import (
        DEFAULT_HASH_FAMILY,
        dedup_clusters,
    )

    from opencypher_datalayer_spark.operators.textkit import quality_floor

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    fp = docs.withColumn("fp", F.md5("text"))
    exact = fp.groupBy("fp").agg(F.min("doc_id").alias("exact_keeper"))
    clusters = dedup_clusters(
        spark, sf_dir, hash_family or DEFAULT_HASH_FAMILY
    ).select("doc_id", "cluster_id", "is_keeper")
    # the SAME predicate the streaming clean-ingest gate applies
    # (textkit.quality_floor) — batch verdict and stream must drop
    # identical rows, so the floor has exactly one definition
    reason = (
        F.when(F.col("doc_id") != F.col("exact_keeper"), "exact_dup")
        .when(~F.col("is_keeper"), "near_dup")
        .when(~quality_floor(CLEAN_MIN_TOKENS, CLEAN_MIN_ALPHA), "low_quality")
        .otherwise("kept")
    )
    return (
        fp.join(exact, "fp")
        .join(clusters, "doc_id")
        .select("doc_id", "cluster_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "kept")
        .select("doc_id", "cluster_id", "keep", "reason")
        .orderBy("doc_id")
    )


def _clean_corpus_sql() -> str:
    from opencypher_datalayer_spark.benchqueries.dedup import (
        _DUCK_SHINGLES,
        _duck_minhash_cte,
        BANDS,
    )

    bands = " OR ".join(f"a.band{i} = b.band{i}" for i in range(BANDS))
    return f"""
WITH RECURSIVE s AS ({_DUCK_SHINGLES}),
{_duck_minhash_cte()},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.doc_id < b.doc_id AND ({bands})
),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u WHERE e.v <> r.u
),
comp AS (SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
fp AS (SELECT doc_id, md5(text) AS f FROM documents),
ek AS (SELECT f, MIN(doc_id) AS exact_keeper FROM fp GROUP BY f),
qual AS (
  SELECT doc_id,
         length({_duck_toks()}) AS nt,
         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha
  FROM documents),
r AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
         CASE WHEN d.doc_id <> e.exact_keeper THEN 'exact_dup'
              WHEN d.doc_id <> COALESCE(c.cluster_id, d.doc_id) THEN 'near_dup'
              WHEN q.nt < {CLEAN_MIN_TOKENS} OR q.alpha < {CLEAN_MIN_ALPHA}
                THEN 'low_quality'
              ELSE 'kept' END AS reason
  FROM documents d
  JOIN fp ON fp.doc_id = d.doc_id
  JOIN ek e ON e.f = fp.f
  LEFT JOIN comp c ON c.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id)
SELECT doc_id, cluster_id, reason = 'kept' AS keep, reason
FROM r ORDER BY doc_id
"""


# -- streaming clean ingest (the composed pipeline, streamed) -----------


def st_stream_clean_ingest(
    spark: SparkSession, sf_dir: str, hash_family: str | None = None
) -> DataFrame:
    """The full ingest pipeline as ONE streaming sink
    (``streaming.clean_ingest.StreamingCleanIngest``), replayed
    deterministically: documents arrive as STREAM_NBATCH micro-batches
    (``doc_id % N``), each quality-gated, near-dup-filtered against
    the accumulated survivor corpus, and — survivors only — extended
    into a standing BM25 inverted index built BY the stream. Output:
    the standard top-k retrieval probe served from that stream-built
    index (queries = the lowest surviving doc_ids). The oracle
    recomputes the whole composition — quality cut, the filter's
    epoch-sequential greedy acceptance, and BM25 over exactly the
    survivor set — so a hash match proves the three stages compose
    correctly AND that per-epoch index extension equals a one-shot
    build over the survivors.

    Replay-fresh state per invocation (the ``st_stream_neardup``
    idiom): content-addressed per-process dirs wiped at entry; the
    result frame is checkpointed so it outlives the next wipe."""
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from opencypher_datalayer_spark.benchqueries.dedup import (
        DEFAULT_HASH_FAMILY,
        STREAM_NBATCH,
        WORK_MINHASH,
        _docs_fingerprint,
    )
    from opencypher_datalayer_spark.benchqueries.text import BM25_NQ, BM25_TOPK
    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.bm25_index import SCALE, bm25_scores
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation
    from opencypher_datalayer_spark.streaming.clean_ingest import StreamingCleanIngest

    family = hash_family or DEFAULT_HASH_FAMILY
    docs = rebalance_for_inflation(
        load_table(spark, "documents", sf_dir).select("doc_id", "text"),
        work_per_row=WORK_MINHASH,
    )
    digest = hashlib.md5(
        repr((_docs_fingerprint(sf_dir), family)).encode()
    ).hexdigest()[:10]
    root = os.path.join(
        tempfile.gettempdir(), f"stream_clean_{digest}_p{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    sink = StreamingCleanIngest(
        spark,
        os.path.join(root, "state"),
        ArtifactStore(os.path.join(root, "store")),
        "bm25_index",
        ("stream",),
        CLEAN_MIN_TOKENS,
        CLEAN_MIN_ALPHA,
        hash_family=family,
    )
    # signatures (and the quality gate under them) are pure per-doc
    # functions: compute them ONCE for the whole deterministic arrival
    # sequence and slice per epoch — the st_stream_neardup idiom, via
    # the sink's own apply_sigs entry point (pinned observably
    # identical to per-batch apply by tests/test_stream_clean_ingest).
    # One grouped job supplies every epoch's exact signature count.
    from opencypher_datalayer_spark.operators import minhash as mh
    from opencypher_datalayer_spark.operators.textkit import quality_floor

    clean_all = docs.where(quality_floor(CLEAN_MIN_TOKENS, CLEAN_MIN_ALPHA))
    sig_all = mh.signatures_for(clean_all, family).localCheckpoint()
    counts = {
        int(r["k"]): int(r["c"])
        for r in sig_all.groupBy(
            (F.col("doc_id") % STREAM_NBATCH).alias("k")
        ).agg(F.count("*").alias("c")).collect()
    }
    for k in range(STREAM_NBATCH):
        sink.apply_sigs(
            docs.where(F.col("doc_id") % STREAM_NBATCH == k),
            sig_all.where(F.col("doc_id") % STREAM_NBATCH == k),
            k,
            batch_rows=counts.get(k, 0),
        )
    adir = sink.index_dir()
    queries = (
        docs.join(sink.kept().select("doc_id"), "doc_id")
        .orderBy("doc_id")
        .limit(BM25_NQ)
        .select(F.col("doc_id").alias("q_id"), _tokens(F.col("text")).alias("toks"))
    )
    scored = bm25_scores(spark, adir, queries).where(F.col("doc_id") != F.col("q_id"))
    w = Window.partitionBy("q_id").orderBy(F.col("s_int").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOPK)
        .withColumn(
            "score", F.round(F.col("s_int").cast("double") / F.lit(float(SCALE)), 6)
        )
        .select("q_id", "doc_id", "score", "rk")
        .orderBy("q_id", "rk")
        .localCheckpoint()
    )


def _stream_clean_ingest_sql() -> str:
    """The composed oracle: quality cut -> the streaming filter's
    unrolled epoch-sequential acceptance (``dedup``'s shared CTE
    chain, admission restricted to quality passers) -> the BM25 chain
    (``text``'s shared CTEs) over exactly the survivor set."""
    from opencypher_datalayer_spark.benchqueries.dedup import (
        _DUCK_SHINGLES,
        _duck_minhash_cte,
        _duck_stream_kept_parts,
        _duck_stream_kept_union,
    )
    from opencypher_datalayer_spark.benchqueries.text import BM25_TOPK, _bm25_ctes
    from opencypher_datalayer_spark.operators.bm25_index import SCALE

    qual = (
        f"length({_duck_toks()}) >= {CLEAN_MIN_TOKENS}"
        " AND CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)"
        f" / length(text) >= {CLEAN_MIN_ALPHA}"
    )
    parts = _duck_stream_kept_parts("doc_id IN (SELECT doc_id FROM qual)")
    return f"""
WITH RECURSIVE s AS ({_DUCK_SHINGLES}),
{_duck_minhash_cte().strip().rstrip(',')},
qual AS MATERIALIZED (SELECT doc_id FROM documents WHERE {qual}),
{', '.join(parts)},
survivors AS MATERIALIZED (SELECT doc_id FROM ({_duck_stream_kept_union()})),
sdocs AS MATERIALIZED (
  SELECT d.doc_id, d.text FROM documents d JOIN survivors USING (doc_id)),
{_bm25_ctes("sdocs")}
SELECT q_id, doc_id,
       ROUND(CAST(s_int AS DOUBLE) / {float(SCALE)!r}, 6) AS score, rk
FROM ranked WHERE rk <= {BM25_TOPK}
ORDER BY q_id, rk
"""


QUERIES = {
    "text_repetition": QueryDef(
        text_repetition, TEXT_REPETITION_SQL, "Gopher-style n-gram repetition quality"
    ),
    "st_stream_clean_ingest": QueryDef(
        lambda spark, sf_dir: st_stream_clean_ingest(spark, sf_dir, hash_family="md5"),
        _stream_clean_ingest_sql(),
        "quality gate -> streaming near-dup -> BM25 index extension, probed",
    ),
    # oracle-mode binding (the dedup family's idiom): the driver checks
    # against DuckDB's md5 bands; library callers get xxhash64
    "text_clean_corpus": QueryDef(
        lambda spark, sf_dir: text_clean_corpus(spark, sf_dir, hash_family="md5"),
        _clean_corpus_sql(),
        "composed per-doc keep/drop verdict (exact dup > near dup > quality)",
    ),
    "text_mixture_upsample": QueryDef(
        text_mixture_upsample, TEXT_MIXTURE_SQL, "epoch-weighted deterministic mixture"
    ),
    "text_decontaminate": QueryDef(
        text_decontaminate, TEXT_DECONTAMINATE_SQL, "eval-set n-gram decontamination"
    ),
    "text_negative_samples": QueryDef(
        text_negative_samples,
        TEXT_NEGATIVES_SQL,
        f"deterministic {NEG_K}-per-doc contrastive negatives",
    ),
}
