"""Similarity search over the ``embeddings`` table (``array<float>``).

Two paths:

- brute-force cosine: exact, O(n*m) — expressed entirely with
  ``zip_with`` / ``aggregate`` column expressions (sequential in-array
  summation, IEEE-deterministic, so it hash-matches DuckDB's list
  lambdas without tolerance);
- random-hyperplane LSH: sign-bit bucket from D deterministic
  hyperplanes (seeded Python constants inlined into both engines) —
  candidate generation becomes a bucket equi-join, the 100 TB path.

Vectors are cast float->double BEFORE any arithmetic: float32 ops would
round differently between engines.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import QueryDef
from opencypher_datalayer_spark.benchqueries.memo import register_memo_cache
from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation
from opencypher_datalayer_spark.sources.tables import load_table

DIM = 64
N_PLANES = 8
_rng = random.Random(7)
# hyperplane components in [-1, 1], rounded so the SQL literals are exact
HYPERPLANES = [[round(_rng.uniform(-1, 1), 6) for _ in range(DIM)] for _ in range(N_PLANES)]

# Candidate generation widens the bucketing ADAPTIVELY with corpus
# size: a fixed 2^8-bucket table makes same-bucket pair volume
# Theta(n^2/256) — measured at the sf10 rehearsal as 92.7M candidate
# pairs from 200k vectors (55 s of cosine evaluation alone). Extra
# planes (same seeded stream, so the first 8 stay the oracle set) keep
# expected bucket occupancy near LSH_TARGET_OCCUPANCY, making candidate
# volume ~linear in corpus size. At <= 2^(8+6) * 64 vectors the plane
# count is the oracle's 8, so every driver- and selfcheck-scale result
# is byte-identical to the static bucketing.
MAX_PLANES = 48
# LSH_BANDS (defined below, near the multiband query) independent
# band slices each need the FULL adaptive width, so the pool holds
# LSH_BANDS * MAX_PLANES planes: slicing ALL_PLANES[k*w:(k+1)*w] with
# w up to MAX_PLANES must never truncate band k>0 to fewer planes than
# band 0 (silently weaker AND-amplification) or to an empty slice
# (ADVICE r6 #2). Same seeded stream — the first MAX_PLANES entries
# are unchanged, so single-band results at every scale are identical.
_N_BANDS_POOL = 2  # keep in sync with LSH_BANDS (asserted below)
_EXTRA_PLANES = [
    [round(_rng.uniform(-1, 1), 6) for _ in range(DIM)]
    for _ in range(_N_BANDS_POOL * MAX_PLANES - N_PLANES)
]
ALL_PLANES = HYPERPLANES + _EXTRA_PLANES
LSH_TARGET_OCCUPANCY = 64


def _band_planes(k: int, w: int) -> list[list[float]]:
    """Band k's disjoint plane slice at width w. Guards the pool-size
    invariant: every band gets exactly w planes."""
    planes = ALL_PLANES[k * w : (k + 1) * w]
    assert len(planes) == w, (
        f"plane pool exhausted: band {k} width {w} needs "
        f"{(k + 1) * w} planes, pool has {len(ALL_PLANES)}"
    )
    return planes


def _emb_rows(sf_dir: str) -> int:
    """Embeddings row count from parquet footers (cached; see
    operators.scale._footer_stats) — drives the adaptive plane count."""
    import glob
    import os

    from opencypher_datalayer_spark.operators.scale import _footer_stats

    path = os.path.join(sf_dir, "embeddings.parquet")
    files = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    total = 0
    for f in files:
        try:
            total += _footer_stats(f)[1]
        except OSError:
            pass
    return total


def _lsh_n_planes(sf_dir: str) -> int:
    """Planes for candidate generation: enough that expected occupancy
    n / 2^planes stays near LSH_TARGET_OCCUPANCY, never fewer than the
    oracle's N_PLANES, capped at MAX_PLANES."""
    import math

    n = _emb_rows(sf_dir)
    if n <= LSH_TARGET_OCCUPANCY:
        return N_PLANES
    return min(MAX_PLANES, max(N_PLANES, math.ceil(math.log2(n / LSH_TARGET_OCCUPANCY))))

COS_THRESHOLD = 0.4  # synthetic embeddings top out near 0.6 cosine
TOPK = 5
N_QUERY = 10  # first N vec_ids serve as the query set for top-k

# Per-corpus-row inflated work for rebalance_for_inflation's gate:
# every vector-scan family does ~queries x dim (or planes x dim) flops
# per row, so a 2k-row sf0.1 corpus is ~4M units — below the gate, the
# re-split shuffle costs more than the single-core scan; a 500k-row
# sf10 corpus is ~1B units and re-splits.
WORK_VEC_SCAN = 32 * DIM


def _vec(col: str = "embedding") -> F.Column:  # type: ignore[name-defined]
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:  # type: ignore[name-defined]
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a) -> F.Column:  # type: ignore[name-defined]
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


_DUCK_VEC = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_DUCK_DOT = "list_sum(list_transform(list_zip({a}, {b}), t -> t[1] * t[2]))"
_DUCK_NORM = "sqrt(list_sum(list_transform({a}, x -> x * x)))"


# -- brute-force cosine pairs ------------------------------------------


def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine >= {COS_THRESHOLD} (rounded to 6dp before the
    threshold so the cut is engine-stable)."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), (_norm(_vec())).alias("nrm")
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= COS_THRESHOLD)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


SIM_COSINE_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND({_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) >= {COS_THRESHOLD}
ORDER BY id_a, id_b
"""


# -- brute-force top-k neighbors for a query set ------------------------


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{TOPK} cosine neighbors for the first {N_QUERY} vectors.
    The query side is tiny => broadcast; ranking tie-breaks on id.

    The scoring pass is all-pairs BY DESIGN (this is the labeled exact
    baseline; LSH/IVF/SQ8 are the scale paths) — but the ranking
    exchange is not: a map-side partial top-{TOPK} keeps only each Arrow
    batch's best {TOPK} rows per query, so the window shuffle carries
    batches x queries x {TOPK} slim rows, never corpus x queries."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), (_norm(_vec())).alias("nrm")
    )
    queries = emb.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = emb.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    from pyspark.sql import Window

    scored = (
        F.broadcast(queries)
        .join(cand, F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", cos)
        .select("q_id", "c_id", "cosine")
    )
    slim = scored.mapInPandas(
        _partial_topk("cosine", TOPK), "q_id bigint, c_id bigint, cosine double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        slim.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


SIM_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         ROUND({_DUCK_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm), 6) AS cosine
  FROM e q JOIN e c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERY})
SELECT q_id, c_id, cosine, rk FROM (
  SELECT q_id, c_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
  FROM scored)
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


# -- random-hyperplane LSH buckets --------------------------------------


def _plane_literal(p: list[float]) -> F.Column:  # type: ignore[name-defined]
    return F.array(*[F.lit(x) for x in p])


def _bucket_col(planes: list[list[float]]) -> F.Column:  # type: ignore[name-defined]
    """Sign-bit LSH bucket id: bit j = (v . plane_j) > 0, over ``v``."""
    bucket = None
    for j, plane in enumerate(planes):
        bit = F.when(
            _dot(F.col("v"), _plane_literal(plane)) > 0, F.lit(2**j)
        ).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return bucket.cast("bigint")


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH bucket id per vector: bit j = (v . plane_j) > 0.
    Bucketing is the shuffle key for candidate generation at scale."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select("vec_id", _vec().alias("v"))
    return emb.select(
        "vec_id", _bucket_col(HYPERPLANES).alias("bucket")
    ).orderBy("vec_id")


def _duck_lsh_bucket_expr(planes: list | None = None) -> str:
    bits = []
    for j, plane in enumerate(HYPERPLANES if planes is None else planes):
        lit = "[" + ", ".join(f"CAST({x} AS DOUBLE)" for x in plane) + "]"
        bits.append(
            f"(CASE WHEN {_DUCK_DOT.format(a='v', b=lit)} > 0 THEN {2**j} ELSE 0 END)"
        )
    return " + ".join(bits)


SIM_LSH_BUCKETS_SQL = f"""
WITH e AS (SELECT vec_id, {_DUCK_VEC} AS v FROM embeddings)
SELECT vec_id, CAST({_duck_lsh_bucket_expr()} AS BIGINT) AS bucket
FROM e ORDER BY vec_id
"""


def sim_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN candidate pairs = same LSH bucket (equi-join on bucket), with
    exact cosine computed only on candidates — the scale path where the
    brute-force cross join is replaced by a bucketed shuffle."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), (_norm(_vec())).alias("nrm")
    )
    # adaptive bucket width (see ALL_PLANES comment): identical to the
    # oracle's 8 planes at oracle scales, wider on big corpora so the
    # same-bucket pair volume stays ~linear in corpus size
    planes = ALL_PLANES[: _lsh_n_planes(sf_dir)]
    bucketed = emb.withColumn("bucket", _bucket_col(planes))
    a = bucketed.select(
        F.col("bucket"), F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = bucketed.select(
        F.col("bucket"), F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, ["bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .select("bucket", "id_a", "id_b", "cosine")
        .orderBy("bucket", "id_a", "id_b")
    )


SIM_LSH_PAIRS_SQL = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
bucketed AS (
  SELECT vec_id, v, nrm, CAST({_duck_lsh_bucket_expr()} AS BIGINT) AS bucket FROM e)
SELECT a.bucket AS bucket, a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND({_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) AS cosine
FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
ORDER BY bucket, id_a, id_b
"""


# -- multi-band LSH: AND-OR amplified candidate generation --------------

LSH_BANDS = 2
assert LSH_BANDS == _N_BANDS_POOL, "plane pool sized for a different band count"


def sim_lsh_multiband_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-OR amplified LSH candidates: {LSH_BANDS} INDEPENDENT bucket
    tables (disjoint plane slices of the same seeded stream), a pair is
    a candidate if it collides in ANY band. For per-plane collision
    probability p = 1 - theta/pi, single-table recall is p^r while the
    multiband union reaches 1 - (1 - p^r)^b — the standard
    amplification that buys recall at a linear (per-band) candidate
    cost instead of the quadratic cost of fewer planes. Each band uses
    the adaptive width (`_lsh_n_planes`), so band volume stays ~linear
    in corpus size; the union dedups on the pair key and rescores with
    exact cosine once per surviving pair.

    Scale shape: b bucket shuffles + one dropDuplicates shuffle + two
    id-joins for the rescore vectors — all equi-joins, no all-pairs."""
    emb = rebalance_for_inflation(
        load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN
    ).select("vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm"))
    w = _lsh_n_planes(sf_dir)
    cands = None
    for k in range(LSH_BANDS):
        planes = _band_planes(k, w)
        bucketed = emb.withColumn("bucket", _bucket_col(planes))
        a = bucketed.select(F.col("bucket"), F.col("vec_id").alias("id_a"))
        b = bucketed.select(F.col("bucket"), F.col("vec_id").alias("id_b"))
        band = (
            a.join(b, ["bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cands = band if cands is None else cands.unionByName(band)
    cands = cands.dropDuplicates(["id_a", "id_b"])
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cos)
        .select("id_a", "id_b", "cosine")
        .orderBy("id_a", "id_b")
    )


def _duck_multiband_sql() -> str:
    bands = []
    for k in range(LSH_BANDS):
        planes = ALL_PLANES[k * N_PLANES : (k + 1) * N_PLANES]
        bands.append(
            f"SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM "
            f"(SELECT vec_id, CAST({_duck_lsh_bucket_expr(planes)} AS BIGINT) AS bucket, v, nrm FROM e) a "
            f"JOIN (SELECT vec_id, CAST({_duck_lsh_bucket_expr(planes)} AS BIGINT) AS bucket, v, nrm FROM e) b "
            f"ON a.bucket = b.bucket AND a.vec_id < b.vec_id"
        )
    union = " UNION ".join(bands)  # UNION (not ALL): dedups the pair key
    return f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
cands AS ({union})
SELECT c.id_a, c.id_b,
       ROUND({_DUCK_DOT.format(a='x.v', b='y.v')} / (x.nrm * y.nrm), 6) AS cosine
FROM cands c JOIN e x ON c.id_a = x.vec_id JOIN e y ON c.id_b = y.vec_id
ORDER BY id_a, id_b
"""


SIM_LSH_MULTIBAND_SQL = _duck_multiband_sql()


def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOPK} of the multi-band LSH candidate path against the
    exact brute-force top-{TOPK} — the eval metric an ANN pipeline ships
    with: for each query, the fraction of its TRUE nearest neighbors
    that the bucketing would have surfaced as candidates (shares a
    bucket with the query in at least one band). Exact division of two
    small ints -> an engine-stable double.

    Scale shape: the exact side is the (bounded, {N_QUERY}-query)
    brute-force baseline; the candidate probe is two broadcast-sized
    joins of the {N_QUERY * TOPK}-row truth frame against the bucketed
    corpus — never an all-pairs join."""
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "c_id")
    emb = rebalance_for_inflation(
        load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN
    ).select("vec_id", _vec().alias("v"))
    w = _lsh_n_planes(sf_dir)
    hits = None
    for k in range(LSH_BANDS):
        planes = _band_planes(k, w)
        bk = emb.select("vec_id", _bucket_col(planes).alias("bucket"))
        q = bk.select(F.col("vec_id").alias("q_id"), F.col("bucket").alias("qb"))
        c = bk.select(F.col("vec_id").alias("c_id"), F.col("bucket").alias("cb"))
        h = (
            exact.join(q, "q_id")
            .join(c, "c_id")
            .where(F.col("qb") == F.col("cb"))
            .select("q_id", "c_id")
        )
        hits = h if hits is None else hits.unionByName(h)
    hits = hits.dropDuplicates(["q_id", "c_id"]).withColumn("hit", F.lit(1))
    return (
        exact.join(hits, ["q_id", "c_id"], "left")
        .groupBy("q_id")
        .agg((F.count("hit") / F.lit(TOPK)).alias("recall"))
        .orderBy("q_id")
    )


def _duck_ann_recall_sql() -> str:
    band_hits = []
    for k in range(LSH_BANDS):
        planes = ALL_PLANES[k * N_PLANES : (k + 1) * N_PLANES]
        expr = _duck_lsh_bucket_expr(planes)
        band_hits.append(
            f"SELECT t.q_id, t.c_id FROM topk t "
            f"JOIN (SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM e) qb ON t.q_id = qb.vec_id "
            f"JOIN (SELECT vec_id, CAST({expr} AS BIGINT) AS bucket FROM e) cb ON t.c_id = cb.vec_id "
            f"AND qb.bucket = cb.bucket"
        )
    union = " UNION ".join(band_hits)
    return f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         ROUND({_DUCK_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm), 6) AS cosine
  FROM e q JOIN e c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERY}),
topk AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
    FROM scored)
  WHERE rk <= {TOPK}),
hits AS ({union})
SELECT t.q_id, CAST(COUNT(h.c_id) AS DOUBLE) / {TOPK} AS recall
FROM topk t LEFT JOIN hits h ON t.q_id = h.q_id AND t.c_id = h.c_id
GROUP BY t.q_id
ORDER BY t.q_id
"""


SIM_ANN_RECALL_SQL = _duck_ann_recall_sql()


# -- IVF: inverted-file ANN (coarse quantize -> probe nearest cells) ----

K_CELLS = 8
# nprobe=4 is the measured recall@5 >= RECALL_FLOOR operating point on
# this corpus (VERDICT r6 #1): mean recall vs the exact top-5 is
# 0.90 at sf0.01, 0.94 at sf0.1, 1.00 at sf10 (nprobe=2 gave
# 0.90/0.86 at sf0.1/sf10; nprobe=3 gave 0.82 at sf0.01). The
# near-uniform synthetic embeddings put true neighbors at cosine
# ~0.33-0.6, so cells are weakly separating and half the (toy, 8-cell)
# codebook must be probed; with a real trained codebook the same floor
# is met at a much smaller probe fraction. sim_ivf_recall measures
# this per round; tests/test_ann_recall.py pins the floor.
NPROBE = 4
RECALL_FLOOR = 0.9  # pinned minimum MEAN recall@TOPK of the IVF answer path


def _ivf_parts(spark: SparkSession, sf_dir: str):
    """(embeddings, centroids, assignment). The coarse quantizer is a
    deterministic sample (vec_id < {K_CELLS}) standing in for an
    offline-trained k-means codebook: iterative mean updates sum doubles
    in engine-specific order, which would break oracle hash-equality —
    assignment/probe mechanics are identical either way. Cell id =
    argmax cosine (rounded 6dp, tie-break on centroid id)."""
    from pyspark.sql import Window

    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm")
    )
    cents = emb.where(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn")), 6)
    w = Window.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("cell").asc())
    assign = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("c_cos", cos)
        .withColumn("crk", F.row_number().over(w))
        .where(F.col("crk") == 1)
        .select("vec_id", "cell", "v", "nrm")
    )
    return emb, cents, assign


_DUCK_IVF_CTES = f"""
e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM e WHERE vec_id < {K_CELLS}),
assign AS (
  SELECT vec_id, cell, v, nrm FROM (
    SELECT e.vec_id, c.cell, e.v, e.nrm,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY ROUND({_DUCK_DOT.format(a='e.v', b='c.cv')} / (e.nrm * c.cn), 6) DESC,
                      c.cell ASC) AS crk
    FROM e CROSS JOIN cents c)
  WHERE crk = 1)
"""


def sim_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell assignment + occupancy — the partition layout an IVF
    index would persist (partitionBy(cell) at scale)."""
    _, _, assign = _ivf_parts(spark, sf_dir)
    return (
        assign.groupBy("cell")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec"))
        .orderBy("cell")
    )


SIM_IVF_CELLS_SQL = f"""
WITH {_DUCK_IVF_CTES}
SELECT cell, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec
FROM assign GROUP BY cell ORDER BY cell
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-{TOPK} via IVF probe: each query scores only vectors in
    its {NPROBE} nearest cells — the 100 TB path where the scored set is
    a cell-pruned fraction of the corpus (vs brute-force's full scan).
    Exact same approximation in the oracle => value-level comparable."""
    from pyspark.sql import Window

    emb, cents, assign = _ivf_parts(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    qcos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    wprobe = Window.partitionBy("q_id").orderBy(F.col("p_cos").desc(), F.col("cell").asc())
    probes = (
        F.broadcast(queries)
        .crossJoin(F.broadcast(cents))
        .withColumn("p_cos", qcos)
        .withColumn("prk", F.row_number().over(wprobe))
        .where(F.col("prk") <= NPROBE)
        .select("q_id", "qv", "qn", "cell")
    )
    cand = assign.select(F.col("vec_id").alias("c_id"), "cell", F.col("v").alias("cv2"), F.col("nrm").alias("cn2"))
    cos = F.round(_dot(F.col("qv"), F.col("cv2")) / (F.col("qn") * F.col("cn2")), 6)
    wk = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        probes.join(cand, "cell")
        .where(F.col("q_id") != F.col("c_id"))
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "c_id", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


SIM_IVF_TOPK_SQL = f"""
WITH {_DUCK_IVF_CTES},
queries AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < {N_QUERY}),
probes AS (
  SELECT q_id, qv, qn, cell FROM (
    SELECT q.q_id, q.qv, q.qn, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DUCK_DOT.format(a='q.qv', b='c.cv')} / (q.qn * c.cn), 6) DESC,
                      c.cell ASC) AS prk
    FROM queries q CROSS JOIN cents c)
  WHERE prk <= {NPROBE}),
scored AS (
  SELECT p.q_id, a.vec_id AS c_id,
         ROUND({_DUCK_DOT.format(a='p.qv', b='a.v')} / (p.qn * a.nrm), 6) AS cosine
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE p.q_id <> a.vec_id)
SELECT q_id, c_id, cosine, rk FROM (
  SELECT q_id, c_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
  FROM scored)
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


def sim_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOPK} of the PRODUCTION ANN answer path (the
    partition-pruned IVF probe, nprobe={NPROBE}) against the exact
    brute-force top-{TOPK} — the quality number the pipeline is tuned
    by. Distinct from :func:`sim_ann_recall`, which measures the LSH
    *candidate generator*: this one scores the ranked answers a user
    gets back. The committed operating point (NPROBE) is chosen so the
    mean stays >= RECALL_FLOOR at every rehearsed scale; the floor is
    pinned in tests/test_ann_recall.py.

    Scale shape: both sides are {N_QUERY}-query bounded frames
    ({N_QUERY * TOPK} rows each) — the recall join is trivially small;
    all the heavy lifting happens inside the two ranked inputs."""
    exact = sim_topk_bruteforce(spark, sf_dir).select("q_id", "c_id")
    ivf = (
        sim_ivf_pruned_topk(spark, sf_dir)
        .select("q_id", "c_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(ivf, ["q_id", "c_id"], "left")
        .groupBy("q_id")
        .agg((F.count("hit") / F.lit(TOPK)).alias("recall"))
        .orderBy("q_id")
    )


SIM_IVF_RECALL_SQL = f"""
WITH {_DUCK_IVF_CTES},
queries AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < {N_QUERY}),
probes AS (
  SELECT q_id, qv, qn, cell FROM (
    SELECT q.q_id, q.qv, q.qn, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.q_id
             ORDER BY ROUND({_DUCK_DOT.format(a='q.qv', b='c.cv')} / (q.qn * c.cn), 6) DESC,
                      c.cell ASC) AS prk
    FROM queries q CROSS JOIN cents c)
  WHERE prk <= {NPROBE}),
ivf AS (
  SELECT q_id, c_id FROM (
    SELECT p.q_id, a.vec_id AS c_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.q_id
             ORDER BY ROUND({_DUCK_DOT.format(a='p.qv', b='a.v')} / (p.qn * a.nrm), 6) DESC,
                      a.vec_id ASC) AS rk
    FROM probes p JOIN assign a ON p.cell = a.cell
    WHERE p.q_id <> a.vec_id)
  WHERE rk <= {TOPK}),
exact AS (
  SELECT q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY ROUND({_DUCK_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm), 6) DESC,
                      c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {N_QUERY})
  WHERE rk <= {TOPK})
SELECT t.q_id, CAST(COUNT(i.c_id) AS DOUBLE) / {TOPK} AS recall
FROM exact t LEFT JOIN ivf i ON t.q_id = i.q_id AND t.c_id = i.c_id
GROUP BY t.q_id
ORDER BY t.q_id
"""


# -- embedding near-dup clustering --------------------------------------

DUP_COS = 0.55  # near-dup threshold for the synthetic embeddings


def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup: vectors with cosine >=
    {DUP_COS} are duplicates; connected components give cluster ids and
    min-id keepers (same operator as the text-LSH clustering — the
    modality changes, the clustering step doesn't). Candidate pairs come
    from the LSH buckets (scale path), rescored exactly; the oracle
    reproduces bucketing + threshold + a recursive-CTE closure."""
    from opencypher_datalayer_spark.operators.components import connected_components

    pairs = sim_lsh_candidate_pairs(spark, sf_dir).where(F.col("cosine") >= DUP_COS)
    comps = connected_components(pairs, "id_a", "id_b")
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select("vec_id")
    return (
        emb.join(comps, emb.vec_id == comps.id, "left")
        .select(
            "vec_id",
            F.coalesce(F.col("comp"), F.col("vec_id")).alias("cluster_id"),
        )
        .withColumn("is_keeper", F.col("vec_id") == F.col("cluster_id"))
        .orderBy("vec_id")
    )


DEDUP_EMB_CLUSTERS_SQL = f"""
WITH RECURSIVE e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
bucketed AS (
  SELECT vec_id, v, nrm, CAST({_duck_lsh_bucket_expr()} AS BIGINT) AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE ROUND({_DUCK_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) >= {DUP_COS}),
und AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u, v FROM und
  UNION
  SELECT r.u, e2.v FROM reach r JOIN und e2 ON r.v = e2.u WHERE e2.v <> r.u),
comp AS (SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u)
SELECT emb.vec_id,
       COALESCE(c.cluster_id, emb.vec_id) AS cluster_id,
       emb.vec_id = COALESCE(c.cluster_id, emb.vec_id) AS is_keeper
FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.vec_id
ORDER BY emb.vec_id
"""


# -- int8 scalar quantization + quantized-dot ANN -----------------------

SQ8_RERANK = 20  # candidates kept per query from the quantized pass


def _partial_topk(score_col: str, k: int):
    """Arrow-batched map-side combiner for distributed top-k: per batch,
    keep only the top-``k`` rows per ``q_id`` by (score desc, c_id asc).
    Exact — every global top-k row is within its own batch's top-k under
    the same order — and it bounds what the downstream window exchange
    carries to batches x queries x k instead of the full scored scan."""

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(
                ["q_id", score_col, "c_id"], ascending=[True, False, True]
            )
            yield pdf.groupby("q_id", sort=False).head(k)

    return fn


def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-{TOPK} via int8 scalar quantization: per-dimension
    symmetric codes ``round(x / (maxabs_d / 127))``, candidates ranked by
    the exact INTEGER code dot product (4x smaller vectors, SIMD-friendly
    integer math — the memory-bound scan path of a quantized index),
    top-{SQ8_RERANK} per query reranked with exact float cosine.

    Scale shape: the per-dimension scale vector is one tiny aggregate
    (posexplode -> max(abs) per dim, {DIM} rows) broadcast back as a
    single-row array — the corpus is scanned once to train, once to
    encode, never shuffled; the quantized scan itself is a broadcast
    (queries) x corpus map-side pass. All arithmetic is
    engine-portable: integer codes are exact, ``floor(x/s + 0.5)``
    rounds identically in Spark and DuckDB (no round-half-to-even
    ambiguity), and the rerank reuses the 6dp-rounded cosine."""
    from pyspark.sql import Window

    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm")
    )
    scales_row = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x"))).alias("mx"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("ps"))
        .select(F.transform("ps", lambda s: s["mx"] / F.lit(127.0)).alias("scales"))
    )
    code = F.zip_with(
        F.col("v"),
        F.col("scales"),
        lambda x, s: F.when(s > 0, F.floor(x / s + F.lit(0.5))).otherwise(F.lit(0)).cast(
            "bigint"
        ),
    )
    coded = emb.crossJoin(F.broadcast(scales_row)).select(
        "vec_id", "v", "nrm", code.alias("code")
    )
    queries = coded.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("code").alias("qc"),
    )
    cand = coded.select(
        F.col("vec_id").alias("c_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
        F.col("code").alias("cc"),
    )
    qdot = F.aggregate(
        F.zip_with(F.col("qc"), F.col("cc"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # scoring stays a map-side broadcast join, but only the slim
    # (q_id, c_id, approx_dot) triple flows downstream — the float
    # vectors rejoin AFTER the shortlist instead of riding the exchange
    scored = (
        F.broadcast(queries.select("q_id", "qc"))
        .join(cand.select("c_id", "cc"), F.col("q_id") != F.col("c_id"))
        .withColumn("approx_dot", qdot)
        .select("q_id", "c_id", "approx_dot")
    )
    # map-side partial top-k (the 100 TB shape): each Arrow batch emits
    # at most SQ8_RERANK rows per query, so the global window's exchange
    # carries candidates x queries, not corpus x queries. Sound because
    # every global top-SQ8_RERANK row is, in its own batch, within that
    # batch's top-SQ8_RERANK under the same (dot desc, c_id asc) order.
    partial = _partial_topk("approx_dot", SQ8_RERANK)
    slim = scored.mapInPandas(partial, "q_id bigint, c_id bigint, approx_dot bigint")
    wapprox = Window.partitionBy("q_id").orderBy(F.col("approx_dot").desc(), F.col("c_id").asc())
    shortlist = (
        slim.withColumn("ark", F.row_number().over(wapprox))
        .where(F.col("ark") <= SQ8_RERANK)
        .drop("ark")
    )
    # rerank fetch: the shortlist is <= N_QUERY * SQ8_RERANK rows —
    # broadcast it against the corpus so the vector fetch is a map-side
    # semi-join (one extra columnar scan, zero corpus shuffle)
    cvecs = emb.select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    wk = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return (
        cvecs.join(F.broadcast(shortlist), "c_id")
        .join(F.broadcast(queries.select("q_id", "qv", "qn")), "q_id")
        .withColumn("cosine", cos)
        .withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "c_id", "approx_dot", "cosine", "rk")
        .orderBy("q_id", "rk")
    )


SIM_SQ8_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm
  FROM embeddings),
sc AS (
  SELECT list(mx / 127 ORDER BY pos) AS scales FROM (
    SELECT i AS pos, max(abs(v[i])) AS mx
    FROM e, range(1, {DIM} + 1) r(i) GROUP BY i)),
coded AS (
  SELECT vec_id, v, nrm,
         list_transform(range(1, {DIM} + 1),
           i -> CAST(CASE WHEN scales[i] > 0
                          THEN floor(v[i] / scales[i] + 0.5)
                          ELSE 0 END AS BIGINT)) AS code
  FROM e, sc),
approx AS (
  SELECT q.vec_id AS q_id, q.v AS qv, q.nrm AS qn,
         c.vec_id AS c_id, c.v AS cv, c.nrm AS cn,
         CAST(list_sum(list_transform(list_zip(q.code, c.code), t -> t[1] * t[2]))
              AS BIGINT) AS approx_dot
  FROM coded q JOIN coded c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERY}),
shortlist AS (
  SELECT q_id, c_id, approx_dot, qv, qn, cv, cn FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY approx_dot DESC, c_id ASC) AS ark
    FROM approx)
  WHERE ark <= {SQ8_RERANK}),
rescored AS (
  SELECT q_id, c_id, approx_dot,
         ROUND({_DUCK_DOT.format(a='qv', b='cv')} / (qn * cn), 6) AS cosine
  FROM shortlist)
SELECT q_id, c_id, approx_dot, cosine, rk FROM (
  SELECT q_id, c_id, approx_dot, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk
  FROM rescored)
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


def _sq8_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, code: array<bigint>) — the shared SQ8 encoding stage."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select("vec_id", _vec().alias("v"))
    scales_row = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.max(F.abs(F.col("x"))).alias("mx"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mx"))).alias("ps"))
        .select(F.transform("ps", lambda s: s["mx"] / F.lit(127.0)).alias("scales"))
    )
    code = F.zip_with(
        F.col("v"),
        F.col("scales"),
        lambda x, s: F.when(s > 0, F.floor(x / s + F.lit(0.5))).otherwise(F.lit(0)).cast(
            "bigint"
        ),
    )
    return emb.crossJoin(F.broadcast(scales_row)).select("vec_id", code.alias("code"))


def sim_sq8_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized-Python twin of the SQ8 scan: candidate code
    batches stream through ``mapInPandas`` and are scored against the
    (tiny, driver-collected) query code matrix with ONE numpy int64
    matmul per Arrow batch — the shape a real quantized scorer uses
    when the distance kernel outgrows column expressions. Integer
    matmul is EXACT (no float accumulation order), so unlike a float
    BLAS path this one carries a full value-level oracle; ranking
    tie-breaks (approx_dot desc, c_id). Collecting the {N_QUERY}
    query codes is metadata-scale by construction."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    codes = _sq8_codes(spark, sf_dir)
    qrows = sorted(
        codes.where(F.col("vec_id") < N_QUERY).collect(), key=lambda r: r["vec_id"]
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["code"] for r in qrows], dtype=np.int64)  # (Q, D)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["vec_id"].to_numpy(np.int64)
            c_mat = np.array(list(pdf["code"]), dtype=np.int64)  # (B, D)
            dots = c_mat @ q_mat.T  # (B, Q) exact int64
            # map-side partial top-k: emit only each query's per-batch
            # top-(TOPK+1) (slack row absorbs a possible self-match), so
            # the window exchange carries batches x Q x K rows, not B x Q.
            # lexsort matches the global order (approx_dot desc, c_id asc).
            k = min(TOPK + 1, len(pdf))
            oq, oc, od = [], [], []
            for j, qid in enumerate(q_ids):
                col = dots[:, j]
                top = np.lexsort((c_ids, -col))[:k]
                keep = top[c_ids[top] != qid][:TOPK]
                oq.append(np.full(len(keep), qid, dtype=np.int64))
                oc.append(c_ids[keep])
                od.append(col[keep])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(oq),
                    "c_id": np.concatenate(oc),
                    "approx_dot": np.concatenate(od),
                }
            )

    from pyspark.sql import Window

    scored = codes.mapInPandas(score, "q_id bigint, c_id bigint, approx_dot bigint")
    w = Window.partitionBy("q_id").orderBy(F.col("approx_dot").desc(), F.col("c_id").asc())
    return (
        scored.where(F.col("q_id") != F.col("c_id"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .orderBy("q_id", "rk")
    )


SIM_SQ8_MATMUL_SQL = f"""
WITH e AS (
  SELECT vec_id, {_DUCK_VEC} AS v FROM embeddings),
sc AS (
  SELECT list(mx / 127 ORDER BY pos) AS scales FROM (
    SELECT i AS pos, max(abs(v[i])) AS mx
    FROM e, range(1, {DIM} + 1) r(i) GROUP BY i)),
coded AS (
  SELECT vec_id,
         list_transform(range(1, {DIM} + 1),
           i -> CAST(CASE WHEN scales[i] > 0
                          THEN floor(v[i] / scales[i] + 0.5)
                          ELSE 0 END AS BIGINT)) AS code
  FROM e, sc),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         CAST(list_sum(list_transform(list_zip(q.code, c.code), t -> t[1] * t[2]))
              AS BIGINT) AS approx_dot
  FROM coded q JOIN coded c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < {N_QUERY})
SELECT q_id, c_id, approx_dot, rk FROM (
  SELECT q_id, c_id, approx_dot,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY approx_dot DESC, c_id ASC) AS rk
  FROM scored)
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


# -- centroid aggregation (vector agg over groups) ----------------------


# -- cell-partitioned IVF index (storage-pruned probe scan) -------------


class _IndexDirCache(dict):
    """fingerprint -> built index dir. ``clear()`` (what the bench's
    ``clear_memo_caches`` calls) removes the on-disk index too, so every
    timed run pays the full build cost and nothing leaks in /tmp."""

    def clear(self) -> None:  # noqa: A003 - dict interface
        import shutil

        for d in self.values():
            shutil.rmtree(d, ignore_errors=True)
        super().clear()


_IVF_INDEX_DIRS = _IndexDirCache()
register_memo_cache(_IVF_INDEX_DIRS)


def _ivf_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per dataset fingerprint) the cell-partitioned index."""
    from opencypher_datalayer_spark.benchqueries.memo import table_fingerprint
    from opencypher_datalayer_spark.operators.vector_index import build_ivf_index

    key = (sf_dir, table_fingerprint(sf_dir, "embeddings"))
    if key not in _IVF_INDEX_DIRS:
        import tempfile

        d = tempfile.mkdtemp(prefix="ivf_index_")
        build_ivf_index(spark, rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN), d, k_cells=K_CELLS)
        _IVF_INDEX_DIRS[key] = d
    return _IVF_INDEX_DIRS[key]


def sim_ivf_pruned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-{TOPK} through the CELL-PARTITIONED index: vectors are
    stored ``partitionBy(cell)`` and the probe scan reads only admitted
    cells via static partition pruning (round-4 verdict #5 / SCALE.md
    "100x list" #1 — pruning pushed into the parquet scan, not applied
    after it). Row-identical to :func:`sim_ivf_topk`, so the same
    DuckDB oracle value-checks it; the plan-audit test pins the pruned
    file set."""
    from opencypher_datalayer_spark.operators.vector_index import ivf_pruned_topk

    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN).select(
        "vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm")
    )
    queries = emb.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    return ivf_pruned_topk(
        spark, _ivf_index_dir(spark, sf_dir), queries, nprobe=NPROBE, topk=TOPK
    )


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector norm + count — element-wise vector aggregate
    reduced to a scalar so it hashes portably; the full centroid array is
    the same pattern without the final reduce."""
    emb = rebalance_for_inflation(load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN)
    return (
        emb.select("label", _norm(_vec()).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


SIM_CENTROIDS_SQL = f"""
WITH e AS (SELECT label, {_DUCK_NORM.format(a=_DUCK_VEC)} AS nrm FROM embeddings)
SELECT label, COUNT(*) AS n,
       ROUND(AVG(nrm), 6) AS avg_norm,
       ROUND(MIN(nrm), 6) AS min_norm,
       ROUND(MAX(nrm), 6) AS max_norm
FROM e GROUP BY label ORDER BY label
"""


QUERIES = {
    "sim_cosine_pairs": QueryDef(
        sim_cosine_pairs, SIM_COSINE_PAIRS_SQL, f"exact cosine pairs >= {COS_THRESHOLD}"
    ),
    "sim_topk_bruteforce": QueryDef(
        sim_topk_bruteforce, SIM_TOPK_SQL, f"exact top-{TOPK} neighbors, {N_QUERY} queries"
    ),
    "sim_lsh_buckets": QueryDef(
        sim_lsh_buckets, SIM_LSH_BUCKETS_SQL, f"{N_PLANES}-plane sign LSH buckets"
    ),
    "sim_lsh_candidate_pairs": QueryDef(
        sim_lsh_candidate_pairs, SIM_LSH_PAIRS_SQL, "bucketed ANN candidates + exact rerank"
    ),
    "sim_lsh_multiband_pairs": QueryDef(
        sim_lsh_multiband_pairs,
        SIM_LSH_MULTIBAND_SQL,
        f"{LSH_BANDS}-band AND-OR amplified LSH candidates + exact rerank",
    ),
    "sim_ann_recall": QueryDef(
        sim_ann_recall,
        SIM_ANN_RECALL_SQL,
        f"recall@{TOPK} of multiband LSH candidates vs exact top-{TOPK}",
    ),
    "sim_label_centroids": QueryDef(
        sim_label_centroids, SIM_CENTROIDS_SQL, "per-label vector-norm aggregates"
    ),
    "dedup_embedding_clusters": QueryDef(
        dedup_embedding_clusters,
        DEDUP_EMB_CLUSTERS_SQL,
        f"cosine>={DUP_COS} near-dup clusters over LSH candidates",
    ),
    "sim_ivf_cells": QueryDef(
        sim_ivf_cells, SIM_IVF_CELLS_SQL, f"IVF coarse-quantizer assignment, {K_CELLS} cells"
    ),
    "sim_ivf_topk": QueryDef(
        sim_ivf_topk, SIM_IVF_TOPK_SQL, f"IVF nprobe={NPROBE} ANN top-{TOPK}"
    ),
    "sim_ivf_recall": QueryDef(
        sim_ivf_recall,
        SIM_IVF_RECALL_SQL,
        f"recall@{TOPK} of the pruned-IVF answer path vs exact top-{TOPK}",
    ),
    "sim_ivf_pruned_topk": QueryDef(
        sim_ivf_pruned_topk,
        SIM_IVF_TOPK_SQL,
        f"cell-partitioned IVF index, partition-pruned probe scan, top-{TOPK}",
    ),
    "sim_sq8_topk": QueryDef(
        sim_sq8_topk,
        SIM_SQ8_TOPK_SQL,
        f"int8 scalar-quantized scan, top-{SQ8_RERANK} rerank, top-{TOPK}",
    ),
    "sim_sq8_matmul_topk": QueryDef(
        sim_sq8_matmul_topk,
        SIM_SQ8_MATMUL_SQL,
        "Arrow-batched numpy int64 matmul SQ8 scorer (exact oracle)",
    ),
}
