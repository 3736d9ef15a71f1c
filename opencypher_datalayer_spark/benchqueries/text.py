"""Text-analysis operators over ``documents``: quality scoring, token
counting, language-ID heuristic, document fingerprinting.

All pure column expressions (regexp/string/array builtins — JVM-side,
codegen'd); ratios are single IEEE divisions of exact integers, so the
oracles hash-match without tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation

# Per-doc inflated work for rebalance_for_inflation's gate: token
# explode / window chunking emits ~64 rows per ~300-char doc, far below
# the MinHash/vector-scan inflation — at sf0.1 these stages stay below
# the gate (the re-split measurably taxed them in round 5); at sf10 the
# 500k-doc explode clears it and re-splits.
WORK_TOKENIZE = 64
from opencypher_datalayer_spark.sources.tables import load_table

# language marker words for the stopword-hit heuristic; deterministic
# tie-break = first in this order
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "und", "die", "das", "ist"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
}
_WORD_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"  # BPE-ish token classes

# shared tokenizer — canonical home: operators.textkit (r9 kernel
# promotion; benchqueries adapts, never the reverse)
from opencypher_datalayer_spark.operators.textkit import tokens as _tokens  # noqa: E402


# -- quality stats ------------------------------------------------------


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    n_space = F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        ((F.length("text") - n_space).cast("double") / n_tokens).alias("avg_token_len"),
        (n_alpha.cast("double") / F.length("text")).alias("alpha_ratio"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / n_tokens).alias("ttr"),
    ).orderBy("doc_id")


TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, n_chars,
       length(toks) AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE) / length(toks) AS avg_token_len,
       CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio,
       length(list_distinct(toks)) AS n_unique_tokens,
       CAST(length(list_distinct(toks)) AS DOUBLE) / length(toks) AS ttr
FROM t
ORDER BY doc_id
"""


# -- BPE-ish token count ------------------------------------------------


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_WORD_RE), 0)).alias("bpeish_tokens"),
    ).orderBy("doc_id")


TEXT_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       length(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
       length(regexp_extract_all(text, '{_WORD_RE}')) AS bpeish_tokens
FROM documents
ORDER BY doc_id
"""


# -- language-ID heuristic ----------------------------------------------


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID: score each language by marker-token hits,
    argmax with deterministic tie-break (marker order, then 'und' for
    no hits anywhere)."""
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.lower(F.col("text")))
    def marker_hits(markers: tuple[str, ...]):
        # single-arg lambda via factory: a default-arg lambda would have
        # arity 2 and F.filter would treat it as the (elem, index) form
        return lambda t: t.isin(*markers)

    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.size(F.filter(toks, marker_hits(markers))).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier languages win ties => apply last
        pred = F.when((best > 0) & (F.col(f"score_{lg}") == best), lg).otherwise(pred)
    return scored.select(
        "doc_id", "lang", *[f"score_{lg}" for lg in langs], pred.alias("pred_lang")
    ).orderBy("doc_id")


def _duck_lang_sql() -> str:
    score_cols = ",\n       ".join(
        "length(list_filter(toks, x -> x IN ({}))) AS score_{}".format(
            ", ".join(f"'{m}'" for m in markers), lang
        )
        for lang, markers in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    best = "GREATEST({})".format(", ".join(f"score_{lg}" for lg in langs))
    pred = "CASE "
    for lg in langs:
        pred += f"WHEN {best} > 0 AND score_{lg} = {best} THEN '{lg}' "
    pred += "ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents),
scored AS (SELECT doc_id, lang, {score_cols} FROM t)
SELECT doc_id, lang, {', '.join(f'score_{lg}' for lg in langs)}, {pred} AS pred_lang
FROM scored ORDER BY doc_id
"""


def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang-ID heuristic vs the ground-truth
    ``lang`` column — the eval-loop query a classifier pipeline runs."""
    pred = text_lang_id(spark, sf_dir).select("lang", "pred_lang")
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


def _duck_confusion_sql() -> str:
    inner = _duck_lang_sql().replace("ORDER BY doc_id", "")
    return f"""
SELECT lang, pred_lang, COUNT(*) AS n FROM ({inner})
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
"""


# -- document fingerprint -----------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form fingerprint: md5 over the sorted distinct lowercase
    token set — robust to word order and repetition."""
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.lower(F.col("text")))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return (
        docs.select("doc_id", F.md5(canon).alias("fingerprint"))
        .orderBy("doc_id")
    )


TEXT_FINGERPRINT_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))), ' ')) AS fingerprint
FROM documents
ORDER BY doc_id
"""


SAMPLE_PCT = 20  # hash-threshold sample rate
QUOTA_K = 30  # per-stratum quota


def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling for training-data curation, two shapes in
    one result: a hash-threshold Bernoulli sample (~{SAMPLE_PCT}% per
    doc, reproducible across engines/runs — no RNG) and a per-language
    quota sample (exactly <= {QUOTA_K} docs per lang, taken in portable
    hash order). Both are the idiomatic distributed forms: the threshold
    filter is embarrassingly parallel; the quota is one window per
    stratum."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    w = Window.partitionBy("lang").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", h.alias("h"))
        .withColumn("in_bernoulli", (F.col("h") % 100) < SAMPLE_PCT)
        .withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("in_bernoulli") | (F.col("quota_rank") <= QUOTA_K))
        .select("doc_id", "lang", "in_bernoulli", (F.col("quota_rank") <= QUOTA_K).alias("in_quota"))
        .orderBy("doc_id")
    )


TEXT_SAMPLE_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM documents),
ranked AS (
  SELECT doc_id, lang, (h % 100) < {SAMPLE_PCT} AS in_bernoulli,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h ASC, doc_id ASC) <= {QUOTA_K}
           AS in_quota
  FROM h)
SELECT doc_id, lang, in_bernoulli, in_quota
FROM ranked
WHERE in_bernoulli OR in_quota
ORDER BY doc_id
"""


# -- corpus rollup ------------------------------------------------------


def text_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (lang, source) corpus statistics — the monitoring query a
    pipeline runs per ingest batch."""
    docs = load_table(spark, "documents", sf_dir)
    toks = _tokens(F.col("text"))
    return (
        docs.select("lang", "source", F.length("text").alias("nc"), F.size(toks).alias("nt"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("total_chars"),
            F.sum("nt").alias("total_tokens"),
            F.min("nc").alias("min_chars"),
            F.max("nc").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


TEXT_CORPUS_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS BIGINT) AS total_tokens,
       MIN(length(text)) AS min_chars,
       MAX(length(text)) AS max_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


# -- TF-IDF top terms ---------------------------------------------------

TFIDF_TOPK = 3


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TFIDF_TOPK} characteristic terms per document by TF-IDF —
    adapter over :func:`operators.textkit.tfidf_topk` (see its
    docstring for the exact-arithmetic and scale-shape rationale)."""
    from opencypher_datalayer_spark.operators.textkit import tfidf_topk

    return tfidf_topk(
        rebalance_for_inflation(
            load_table(spark, "documents", sf_dir).select("doc_id", "text"),
            work_per_row=WORK_TOKENIZE,
        ),
        TFIDF_TOPK,
    )


TEXT_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM documents),
pairs AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok),
dfs AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM pairs GROUP BY tok),
scored AS (
  SELECT p.doc_id, p.tok, p.tf, d.df,
         CAST(p.tf * ((SELECT COUNT(*) FROM documents) + 1) AS DOUBLE) / (d.df + 1)
           AS tfidf
  FROM pairs p JOIN dfs d ON p.tok = d.tok)
SELECT doc_id, tok, tf, df, tfidf, rk FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC) AS rk
  FROM scored)
WHERE rk <= {TFIDF_TOPK}
ORDER BY doc_id, rk
"""


# -- token-window chunking ---------------------------------------------

CHUNK_W = 16  # tokens per chunk
CHUNK_STRIDE = 12  # chunk start spacing (overlap = W - stride)


def chunk_transform(docs: DataFrame) -> DataFrame:
    """The chunking pipeline at the registry's pinned (W, stride) point
    — adapter over :func:`operators.textkit.chunk_windows` (stateless
    column expressions; tests/test_streaming.py pins stream == batch)."""
    from opencypher_datalayer_spark.operators.textkit import chunk_windows

    return chunk_windows(docs, CHUNK_W, CHUNK_STRIDE)


def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the context-window prep step of
    a training pipeline): each doc explodes into windows of CHUNK_W
    whitespace tokens every CHUNK_STRIDE tokens; the last window may be
    short. Pure column expressions (sequence/posexplode/slice — JVM-side,
    codegen'd): chunking is embarrassingly parallel, no shuffle except
    the presentation orderBy."""
    docs = rebalance_for_inflation(
        load_table(spark, "documents", sf_dir).select("doc_id", "text"),
        work_per_row=WORK_TOKENIZE,
    )
    return chunk_transform(docs).orderBy("doc_id", "chunk_idx")


TEXT_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(length(toks) AS BIGINT), {CHUNK_STRIDE})) AS start
  FROM t WHERE length(toks) > 0)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(length(list_slice(toks, start + 1, start + {CHUNK_W})) AS INTEGER) AS chunk_tokens,
       array_to_string(list_slice(toks, start + 1, start + {CHUNK_W}), ' ') AS chunk_text
FROM s
ORDER BY doc_id, chunk_idx
"""


# -- chunk-level exact dedup -------------------------------------------


def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup at CHUNK granularity — the pass a training pipeline
    runs after windowing, where duplication hides below the document
    level: chunk -> md5 fingerprint -> keeper = lexicographically first
    (doc_id, chunk_idx) occurrence; per-doc rollup of how much of the
    doc survives. Composition of two already-verified stages (chunking
    expressions + hash-groupBy dedup): one shuffle on the fingerprint,
    one on doc_id."""
    chunks = chunk_transform(
        rebalance_for_inflation(
            load_table(spark, "documents", sf_dir).select("doc_id", "text"),
            work_per_row=WORK_TOKENIZE,
        )
    )
    fp = chunks.withColumn("fp", F.md5("chunk_text"))
    keeper_key = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 12, "0"),
        F.lpad(F.col("chunk_idx").cast("string"), 8, "0"),
    )
    keepers = (
        fp.withColumn("k", keeper_key)
        .groupBy("fp")
        .agg(F.min("k").alias("keeper_k"), F.count("*").alias("n_copies"))
    )
    return (
        fp.withColumn("k", keeper_key)
        .join(keepers, "fp")
        .withColumn("is_keeper", F.col("k") == F.col("keeper_k"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("is_keeper"), 0).otherwise(1)).cast("bigint").alias(
                "n_dup_chunks"
            ),
        )
        .withColumn(
            "dup_frac", F.col("n_dup_chunks").cast("double") / F.col("n_chunks")
        )
        .orderBy("doc_id")
    )


TEXT_CHUNK_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, CAST(length(toks) AS BIGINT), {CHUNK_STRIDE})) AS start
  FROM t WHERE length(toks) > 0),
chunks AS (
  SELECT doc_id, CAST(start // {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
         md5(array_to_string(list_slice(toks, start + 1, start + {CHUNK_W}), ' '))
           AS fp,
         lpad(CAST(doc_id AS VARCHAR), 12, '0')
           || lpad(CAST(start // {CHUNK_STRIDE} AS VARCHAR), 8, '0') AS k
  FROM s),
keepers AS (
  SELECT fp, MIN(k) AS keeper_k, COUNT(*) AS n_copies FROM chunks GROUP BY fp)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN c.k = kp.keeper_k THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(SUM(CASE WHEN c.k = kp.keeper_k THEN 0 ELSE 1 END) AS DOUBLE)
         / COUNT(*) AS dup_frac
FROM chunks c JOIN keepers kp ON c.fp = kp.fp
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


# -- deterministic train/val/test split ---------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # remainder is test


def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment: the split is a
    pure function of the doc_id hash, so it survives reshards, reruns,
    engine swaps, and corpus growth (an existing doc never changes
    split when new docs arrive — the property random splits lack).
    Embarrassingly parallel; the rollup is one tiny aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    bucket = h % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select("doc_id", "lang", split.alias("split"))
        .orderBy("doc_id")
    )


TEXT_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                 < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
                 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


# -- sequence packing ---------------------------------------------------

PACK_BUDGET = 256  # token budget per packed sequence
PACK_SHARDS = 8  # parallel packing shards


def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing at the registry's pinned
    (budget, shards) point — adapter over
    :func:`operators.textkit.pack_sequences` (see its docstring for
    the sharding argument). The oracle replays the same scan as a
    recursive CTE per shard."""
    from opencypher_datalayer_spark.operators.textkit import pack_sequences

    return pack_sequences(
        load_table(spark, "documents", sf_dir).select("doc_id", "text"),
        PACK_BUDGET,
        PACK_SHARDS,
    ).orderBy("doc_id")


TEXT_PACK_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         doc_id % {PACK_SHARDS} AS shard,
         CAST(length(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS INTEGER) AS n_tokens,
         row_number() OVER (PARTITION BY doc_id % {PACK_SHARDS} ORDER BY doc_id) AS rn
  FROM documents),
packed AS (
  SELECT doc_id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id,
         CAST(n_tokens AS BIGINT) AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.doc_id, d.shard, d.n_tokens, d.rn,
         CASE WHEN p.acc + d.n_tokens > {PACK_BUDGET} THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.acc + d.n_tokens > {PACK_BUDGET} THEN CAST(d.n_tokens AS BIGINT)
              ELSE p.acc + d.n_tokens END
  FROM d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1)
SELECT doc_id, shard, n_tokens, seq_id, acc AS seq_tokens
FROM packed
ORDER BY doc_id
"""


# -- sensitive-term scrubbing (regex redaction with audit trail) --------

# term list stands in for a PII/blocklist pattern set; the operator shape
# (regex scan + global replace + audit counts, one embarrassingly
# parallel pass) is identical for emails/phones/IDs on a real corpus.
# Patterns stay in the Java-regex ∩ RE2 dialect so both engines agree.
SCRUB_PATTERN = r"\b(key|hash|merge)\b"
SCRUB_TOKEN = "[REDACTED]"


def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact a sensitive-term pattern from every document, emitting the
    audit row a compliance pipeline needs: hit count, before/after
    lengths, and an md5 of the redacted text (value-level proof the
    rewrite is byte-identical across engines). Pure column expressions —
    no shuffle at all; at 100 TB this is a map-only pass that Catalyst
    pipelines into the scan."""
    docs = load_table(spark, "documents", sf_dir)
    redacted = F.regexp_replace(F.col("text"), SCRUB_PATTERN, SCRUB_TOKEN)
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(SCRUB_PATTERN)).alias("n_hits"),
        F.length("text").alias("n_chars_before"),
        F.length(redacted).alias("n_chars_after"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


TEXT_SCRUB_SQL = f"""
SELECT doc_id,
       length(regexp_extract_all(text, '{SCRUB_PATTERN}')) AS n_hits,
       length(text) AS n_chars_before,
       length(regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_TOKEN}', 'g'))
         AS n_chars_after,
       md5(regexp_replace(text, '{SCRUB_PATTERN}', '{SCRUB_TOKEN}', 'g'))
         AS redacted_md5
FROM documents ORDER BY doc_id
"""


# -- deterministic shard layout (training-file export plan) -------------

N_SHARDS = 16


def text_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a shard, a position, and a byte/token offset
    — the exact layout a training-data exporter materializes as
    ``shard-00000-of-00016`` files. Shard = portable hash mod
    {N_SHARDS} (uniform, reproducible, no RNG); order within a shard =
    (hash, doc_id) so the global shuffle is deterministic; offset = the
    exclusive prefix sum of token counts within the shard (a window
    cumulative sum). One shuffle on ``shard`` — at 100 TB each shard is
    written by its own reducer, ``partitionBy(shard)`` style."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    n_tokens = F.size(_tokens(F.col("text")))
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    woff = w.rowsBetween(Window.unboundedPreceding, -1)
    return (
        docs.select("doc_id", h.alias("h"), n_tokens.alias("n_tokens"))
        .withColumn("shard", (F.col("h") % N_SHARDS).cast("int"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "token_offset", F.coalesce(F.sum("n_tokens").over(woff), F.lit(0)).cast("bigint")
        )
        .select("doc_id", "shard", "pos_in_shard", "n_tokens", "token_offset")
        .orderBy("shard", "pos_in_shard")
    )


TEXT_SHARD_SQL = f"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h,
         length(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS n_tokens
  FROM documents),
s AS (
  SELECT doc_id, h, n_tokens, CAST(h % {N_SHARDS} AS INTEGER) AS shard FROM t)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos_in_shard,
       n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS BIGINT)
         AS token_offset
FROM s
WINDOW w AS (PARTITION BY shard ORDER BY h ASC, doc_id ASC)
ORDER BY shard, pos_in_shard
"""


# -- BM25 lexical retrieval (standing inverted-index artifact) -----------

BM25_NQ = 5  # the NQ lowest doc_ids serve as query documents
BM25_TOPK = 5


def build_bm25_artifact(spark: SparkSession, sf_dir: str) -> str:
    """Build (if absent) the standing BM25 inverted-index artifact
    (``operators.bm25_index``) and return its committed version dir.
    Exposed separately so the bench times build and probe as
    first-class phases (the dedup/ANN artifact policy)."""
    from opencypher_datalayer_spark.benchqueries.memo import table_fingerprint
    from opencypher_datalayer_spark.operators.artifacts import default_store
    from opencypher_datalayer_spark.operators.bm25_index import (
        N_BUCKETS,
        write_bm25_index,
    )

    # v2: tok-sorted row groups + (max_tf, min_dl) impact bounds in stats
    # v3: per-block impact bounds in blocks/ (block-max skipping)
    key = ("v3", table_fingerprint(sf_dir, "documents"), N_BUCKETS)
    # no caller-side rebalance: the kernel's builders re-split ahead of
    # the token explode themselves (operators.bm25_index.WORK_TOKENIZE)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return default_store().get_or_build(
        "bm25_index", key, lambda tmp: write_bm25_index(docs, tmp)
    )


def bm25_rankings(spark: SparkSession, sf_dir: str, k: int | None = None) -> DataFrame:
    """(query, matched-doc) BM25 ranking rows — shared by the top-k
    query and the hybrid RRF fusion (``similarity.py``): ``(q_id,
    doc_id, s_int, rk)`` ranked per query on the exact int64 grid sum
    (descending), doc_id ascending. With ``k`` set, serves through the
    MaxScore-lite probe (``operators.bm25_index.bm25_topk`` — term
    upper-bound skipping; identical first-k rows by the MaxScore
    guarantee, so the naive-SQL oracles stay valid); ``k=None`` scores
    every matching document (``bm25_scores``)."""
    from pyspark.sql import Window

    from opencypher_datalayer_spark.operators.bm25_index import bm25_scores, bm25_topk

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    queries = (
        docs.orderBy("doc_id")
        .limit(BM25_NQ)
        .select(F.col("doc_id").alias("q_id"), _tokens(F.col("text")).alias("toks"))
    )
    adir = build_bm25_artifact(spark, sf_dir)
    if k is None:
        scored = bm25_scores(spark, adir, queries).where(
            F.col("doc_id") != F.col("q_id")
        )
    else:
        scored = bm25_topk(spark, adir, queries, k)  # self-excluded inside
    w = Window.partitionBy("q_id").orderBy(F.col("s_int").desc(), F.col("doc_id").asc())
    return scored.withColumn("rk", F.row_number().over(w))


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{BM25_TOPK} BM25 matches per query document (the {BM25_NQ}
    lowest doc_ids; self excluded) — the "find documents like this
    one" retrieval probe of a curation/RAG pipeline, served from the
    STANDING inverted-index artifact (``operators.bm25_index``: the
    postings/stats scans are partition-pruned to the query terms'
    buckets, the query side broadcasts, and the only shuffle carries
    one int64 per matched term). Scoring is the registry's pinned
    log-free BM25 (rational idf; per-term scores floored onto a 1e-9
    integer grid so the sum is order-independent — see the module
    docstring); ranks tie-break on the exact grid sum, never the
    rounded double."""
    from opencypher_datalayer_spark.operators.bm25_index import SCALE

    return (
        bm25_rankings(spark, sf_dir, k=BM25_TOPK)
        .where(F.col("rk") <= BM25_TOPK)
        .withColumn(
            "score", F.round(F.col("s_int").cast("double") / F.lit(float(SCALE)), 6)
        )
        .select("q_id", "doc_id", "score", "rk")
        .orderBy("q_id", "rk")
    )


def _bm25_ctes(docs: str = "documents") -> str:
    """The BM25 oracle CTE chain WITHOUT the ``WITH`` prefix
    (token-for-token mirror of ``operators.bm25_index.bm25_scores`` —
    same parenthesization, so every factor is the identical
    correctly-rounded double; the per-term FLOOR onto the 1e-9 int
    grid makes the SUM order-independent). ``docs`` names the corpus
    relation — the composed clean-ingest oracle scores the stream's
    SURVIVOR set through the same chain."""
    from opencypher_datalayer_spark.operators.bm25_index import B, K1, SCALE

    k1p1 = repr(1.0 + K1)
    one_minus_b = repr(1.0 - B)
    return f"""toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS tok
  FROM {docs}),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
meta AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM {docs}) AS n,
         (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS sumdl),
q AS (SELECT doc_id AS q_id FROM {docs} ORDER BY doc_id LIMIT {BM25_NQ}),
qt AS (SELECT DISTINCT q.q_id, t.tok FROM q JOIN toks t ON t.doc_id = q.q_id),
terms AS (
  SELECT qt.q_id, tf.doc_id,
         CAST(FLOOR(
           (((m.n - d.df + 0.5) / (d.df + 0.5)) + 1.0)
           * ((tf.tf * {k1p1}) / (tf.tf + {K1} * ({one_minus_b} + {B}
                * (l.dl / (CAST(m.sumdl AS DOUBLE) / CAST(m.n AS DOUBLE))))))
           * {float(SCALE)!r}) AS BIGINT) AS ti
  FROM qt
  JOIN tf ON tf.tok = qt.tok AND tf.doc_id <> qt.q_id
  JOIN dfs d ON d.tok = qt.tok
  JOIN dl l ON l.doc_id = tf.doc_id
  CROSS JOIN meta m),
scored AS (SELECT q_id, doc_id, SUM(ti) AS s_int FROM terms GROUP BY q_id, doc_id),
ranked AS (
  SELECT q_id, doc_id, s_int,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY s_int DESC, doc_id ASC) AS rk
  FROM scored)"""


def _bm25_sql(select: str) -> str:
    """Complete BM25 oracle statement: the shared CTE chain over the
    full ``documents`` relation followed by the caller's SELECT (which
    may itself continue the WITH list — the hybrid-RRF oracle does)."""
    return f"""
WITH {_bm25_ctes()}
{select}
"""


def text_bm25_ingest_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval artifact's ingest lifecycle, value-oracled end to
    end (the ``dedup_ingest_loop`` pattern): build the standing
    inverted index on 90% of the corpus, EXTEND it with the remaining
    batch (``extend_bm25_index`` — hard-linked O(batch) commit,
    additive df/corpus deltas), then serve ``text_bm25_topk``'s exact
    query from the GROWN index. The oracle is the plain full-corpus
    BM25 SQL, so a hash match proves extension == rebuild through the
    driver's gate, not just the unit tests.

    Per-invocation tempdir store (reclaimed at exit): extension
    advances the corpus version, so a shared standing store would
    double-ingest the batch on the next invocation — a correctness
    demonstration must be idempotent."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql import Window

    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.bm25_index import (
        SCALE,
        bm25_scores,
        extend_bm25_index,
        write_bm25_index,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    root = tempfile.mkdtemp(prefix="spark_graft_bm25_loop_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    store = ArtifactStore(root)
    store.get_or_build("bm25_index", ("loop",), lambda d: write_bm25_index(corpus, d))
    adir = extend_bm25_index(spark, store, "bm25_index", ("loop",), batch)
    queries = (
        docs.orderBy("doc_id")
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
    )


def _text_bm25_sql() -> str:
    from opencypher_datalayer_spark.operators.bm25_index import SCALE

    return _bm25_sql(
        f"""SELECT q_id, doc_id,
       ROUND(CAST(s_int AS DOUBLE) / {float(SCALE)!r}, 6) AS score, rk
FROM ranked WHERE rk <= {BM25_TOPK}
ORDER BY q_id, rk"""
    )


QUERIES = {
    "text_quality": QueryDef(text_quality, TEXT_QUALITY_SQL, "per-doc quality metrics"),
    "text_token_count": QueryDef(
        text_token_count, TEXT_TOKEN_COUNT_SQL, "whitespace + BPE-ish token counts"
    ),
    "text_lang_id": QueryDef(text_lang_id, _duck_lang_sql(), "stopword-hit language ID"),
    "text_lang_confusion": QueryDef(
        text_lang_confusion, _duck_confusion_sql(), "lang-ID confusion matrix"
    ),
    "text_fingerprint": QueryDef(
        text_fingerprint, TEXT_FINGERPRINT_SQL, "canonical token-set fingerprint"
    ),
    "text_corpus_stats": QueryDef(text_corpus_stats, TEXT_CORPUS_SQL, "per-corpus rollup"),
    "text_stratified_sample": QueryDef(
        text_stratified_sample, TEXT_SAMPLE_SQL, "deterministic Bernoulli + quota sampling"
    ),
    "text_chunk_windows": QueryDef(
        text_chunk_windows, TEXT_CHUNK_SQL, "overlapping token-window chunking"
    ),
    "text_pack_sequences": QueryDef(
        text_pack_sequences, TEXT_PACK_SQL, "sharded next-fit sequence packing"
    ),
    "text_scrub": QueryDef(
        text_scrub, TEXT_SCRUB_SQL, "regex redaction with audit counts + value proof"
    ),
    "text_shard_layout": QueryDef(
        text_shard_layout, TEXT_SHARD_SQL, f"deterministic {N_SHARDS}-shard export layout"
    ),
    "text_tfidf_topk": QueryDef(
        text_tfidf_topk, TEXT_TFIDF_SQL, f"top-{TFIDF_TOPK} TF-IDF terms per doc"
    ),
    "text_chunk_dedup": QueryDef(
        text_chunk_dedup, TEXT_CHUNK_DEDUP_SQL, "chunk-granularity exact dedup rollup"
    ),
    "text_split_assign": QueryDef(
        text_split_assign, TEXT_SPLIT_SQL, "hash-stable train/val/test assignment"
    ),
    "text_bm25_topk": QueryDef(
        text_bm25_topk,
        _text_bm25_sql(),
        f"top-{BM25_TOPK} BM25 retrieval from the standing inverted index",
    ),
    "text_bm25_ingest_loop": QueryDef(
        text_bm25_ingest_loop,
        _text_bm25_sql(),
        "inverted-index build -> extend -> probe lifecycle vs full-corpus recompute",
    ),
}
