"""Trained IVF coarse quantizer with cross-engine-exact arithmetic.

VERDICT r7 #1: the round-5..7 IVF path met its recall floor by probing
4 of 8 sample-picked cells — a 50% probe fraction, which at 100 TB is a
full scan with extra steps. This module replaces the toy codebook with
a spherical k-means quantizer whose every step is reproducible
bit-for-bit by the DuckDB oracle, so the trained path stays fully
value-checked:

- **Integer quantization.** Each unit-normalized vector is scaled by
  10^6 and HALF-UP rounded to int64 (``vq``). All training decisions
  are made on dot products of these integers: products are <= 1e12 and
  sums <= d * 1e12 < 2^53, so every intermediate is EXACT in both
  int64 SQL arithmetic and float64 BLAS — summation order stops
  mattering, which is the whole trick. (Iterative float means are why
  the earlier codebook was a sample: engine-specific summation order
  would break oracle hash-equality. Integer sums restore it.)
- **No rounding at decision points.** Cell argmax / top-a / probe
  ranking compare raw doubles of the form ``(int_dot / sqrt(int)) /
  sqrt(int)`` — identical IEEE ops in numpy, Spark and DuckDB — with
  ties broken by cell id. The only ROUND(x, 6) left is on the output
  cosine, same as every other similarity query.
- **Deterministic init + sampling.** Training sample = ``vec_id % s ==
  0`` (s = ceil(n / TRAIN_CAP)); initial centroids = every
  ``stride``-th sample row in vec_id order. Lloyd updates use the
  exact HALF-UP integer mean ``sign(s) * ((2|s| + c) // (2c))``; cells
  that lose all members drop out, survivors keep their ids.
- **Multi-assignment (boundary replication).** Every vector is indexed
  under its ``ASSIGN_A`` nearest cells (the SPANN-style fix for
  near-uniform corpora where true neighbors sit across cell
  boundaries): measured at sf10 it cuts the probe fraction needed for
  recall@5 >= 0.9 from ~50% (8-cell sample codebook, nprobe=4) to a
  measured 9.6% (K = 8*sqrt(n) = 3576 cells, nprobe = 57 — the grid
  winner over K in {4,8}*sqrt(n) x A in {3,4,6}), at 6x index rows.

Operating points (see SCALE.md §recall): nprobe is a measured
step-table of the corpus size — the fraction needed for the 0.9 floor
FALLS as n grows (0.25 at n=500, 0.36 at n=2k, 0.096 at n=200k; small
corpora are hard for ANY partition-based ANN and cheap to over-probe),
which is the 100 TB story: at n ~ 10^9 the same construction probes a
low-single-digit percent.

The reference has no vector surface (``neo4j.go:238-284`` delegates all
retrieval to Neo4j); this family is part of the engine's
training-data-pipeline extension.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE_Q = 10**6  # quantization scale: unit components -> ~1e6 ints
IVF_K_MULT = 8  # cells = IVF_K_MULT * isqrt(n)
ASSIGN_A = 6  # boundary replication: index each vector in its A cells
IVF_ITERS = 8  # Lloyd iterations (unrolled in the oracle SQL)
TRAIN_CAP = 262144  # sample stride s = ceil(n / TRAIN_CAP)

# Measured nprobe operating points: smallest fixed probe count whose
# mean recall@5 of the answer path meets RECALL_FLOOR (0.9) at each
# rehearsed corpus size (numpy replica of the exact engine arithmetic,
# verified by sim_ivf_recall / tests/test_ann_recall.py). The 250k
# point was re-measured in r10 on a 100-query sample (the original
# 10-query eval said 57, the wider sample scored that 0.844; 86 scores
# 0.924, 114 -> 0.942 — scripts/recall_drift_rehearsal.py +
# /tmp-sweep, SCALE.md §recall-drift). Beyond the largest rehearsed
# scale the committed rule keeps the sf10-measured fraction of cells
# (NPROBE_TAIL_NUM / NPROBE_TAIL_DEN), which the measured trend says
# is an over-probe — rehearse before trusting a cheaper point.
# The mid bracket was widened 21 -> 42 in r13 (VERDICT r12 watch #2):
# at the sf0.1 corpus (2000 vectors) the mean sat EXACTLY on the 0.9
# floor with min 0.8 — admission-bound, not rerank-bound (the float
# probe at 21 scored 0.894; ivf_serving_plan's calibration) — and one
# measured doubling buys mean/min 1.0/1.0 with margin (28/32 both
# plateaued at 0.94/0.8; the bracket's corpora are small, so the wider
# scan is cheap where it applies).
NPROBE_STEPS: list[tuple[int, int]] = [(600, 7), (2500, 42), (250_000, 86)]
NPROBE_TAIL_NUM, NPROBE_TAIL_DEN = 86, 3576


def k_cells_for(n: int) -> int:
    return max(8, IVF_K_MULT * math.isqrt(n))


def train_stride(n: int) -> int:
    return -(-n // TRAIN_CAP)


def ivf_nprobe(n: int) -> int:
    for bound, nprobe in NPROBE_STEPS:
        if n <= bound:
            return nprobe
    return max(
        NPROBE_TAIL_NUM,
        (NPROBE_TAIL_NUM * k_cells_for(n) + NPROBE_TAIL_DEN - 1) // NPROBE_TAIL_DEN,
    )


def nprobe_sql_case(n_expr: str) -> str:
    """The SQL mirror of :func:`ivf_nprobe` (same step table and tail
    constants, generated from the same module values so they cannot
    drift)."""
    clauses = " ".join(
        f"WHEN {n_expr} <= {bound} THEN {npb}" for bound, npb in NPROBE_STEPS
    )
    return (
        f"CASE {clauses} ELSE GREATEST({NPROBE_TAIL_NUM}, ({NPROBE_TAIL_NUM} * "
        f"GREATEST(8, {IVF_K_MULT} * CAST(FLOOR(SQRT({n_expr})) AS BIGINT)) "
        f"+ {NPROBE_TAIL_DEN - 1}) // {NPROBE_TAIL_DEN}) END"
    )


# Filtered (metadata-constrained) probe widening: a predicate that keeps
# a fraction sel of each cell's candidates starves the top-k unless more
# cells are probed. Measured operating points at selectivity ~0.1 (the
# 10-label corpus), smallest multiplier whose same-label recall@5 meets
# RECALL_FLOOR: n=500 -> 8x (4x gave 0.82), n=2000 -> 2x (0.98),
# n=20000 -> 2x (0.98; 1x was 0.88). The multiplier FALLS with n, same
# shape as the probe fraction itself. For materially different
# selectivities, rehearse before trusting these steps.
FILTER_WIDEN_STEPS: list[tuple[int, int]] = [(600, 8), (2_000_000_000, 2)]


def ivf_filtered_nprobe(n: int) -> int:
    """nprobe for a filtered probe: the measured widening multiplier
    applied to the unfiltered step table, capped at the cell count."""
    for bound, mult in FILTER_WIDEN_STEPS:
        if n <= bound:
            return min(k_cells_for(n), mult * ivf_nprobe(n))
    return min(k_cells_for(n), 2 * ivf_nprobe(n))  # pragma: no cover


def filtered_nprobe_sql_case(n_expr: str) -> str:
    """SQL mirror of :func:`ivf_filtered_nprobe` (same steps + cap)."""
    clauses = " ".join(
        f"WHEN {n_expr} <= {bound} THEN {mult}" for bound, mult in FILTER_WIDEN_STEPS
    )
    k_expr = (
        f"GREATEST(8, {IVF_K_MULT} * CAST(FLOOR(SQRT({n_expr})) AS BIGINT))"
    )
    return f"LEAST({k_expr}, (CASE {clauses} ELSE 2 END) * ({nprobe_sql_case(n_expr)}))"


def vq_expr(v="v", nrm="nrm") -> F.Column:
    """int64 quantization of a unit-normalized vector — EXACTLY
    ``floor(abs(x / nrm) * 1e6 + 0.5) * sign(x)``, the same op chain the
    oracle SQL and the numpy trainer apply."""
    return F.transform(
        F.col(v),
        lambda x: (
            F.floor(F.abs(x / F.col(nrm)) * F.lit(float(SCALE_Q)) + F.lit(0.5))
            * F.when(x < 0, F.lit(-1)).otherwise(F.lit(1))
        ).cast("long"),
    )


def _scores(VQ: np.ndarray, vn: np.ndarray, C: np.ndarray, cn: np.ndarray) -> np.ndarray:
    """((vq . cq) / |vq|) / |cq| — float64 matmul of exact ints (every
    intermediate < 2^53, hence exact), then the same two IEEE divisions
    the SQL applies."""
    return (VQ @ C.T) / vn[:, None] / cn[None, :]


def train_codebook(sample_vq: np.ndarray, n_corpus: int) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd iterations on the quantized sample; returns (cell_ids, CQ)
    with cell_ids ascending. ``sample_vq`` must be int-valued float64
    rows ordered by vec_id (the deterministic ``vec_id % s == 0``
    sample)."""
    K = k_cells_for(n_corpus)
    m = len(sample_vq)
    stride = max(m // K, 1)
    C = sample_vq[::stride][:K].copy()
    ids = np.arange(len(C), dtype=np.int64)
    vn = np.sqrt((sample_vq * sample_vq).sum(1))
    for _ in range(IVF_ITERS):
        cn = np.sqrt((C * C).sum(1))
        # argmax score, ties -> lowest cell id: ids ascend with position,
        # stable argsort keeps the first (lowest-id) max
        score = _scores(sample_vq, vn, C, cn)
        asgn = score.argmax(1)  # first max = lowest position = lowest id
        sums = np.zeros_like(C)
        cnt = np.zeros(len(C), dtype=np.float64)
        np.add.at(sums, asgn, sample_vq)
        np.add.at(cnt, asgn, 1.0)
        keep = cnt > 0
        sums, cnt, ids = sums[keep], cnt[keep], ids[keep]
        # exact HALF-UP integer mean (all values exact in float64)
        C = np.sign(sums) * np.floor((2.0 * np.abs(sums) + cnt[:, None]) // (2.0 * cnt[:, None]))
    return ids, C


def top_cells(VQ: np.ndarray, ids: np.ndarray, C: np.ndarray, a: int) -> np.ndarray:
    """Per row: the ``a`` best cell IDS by score desc, cell id asc on
    ties (stable argsort over ascending-id columns)."""
    vn = np.sqrt((VQ * VQ).sum(1))
    score = _scores(VQ, vn, C, cn=np.sqrt((C * C).sum(1)))
    order = np.argsort(-score, axis=1, kind="stable")[:, :a]
    return ids[order]


def collect_sample(vq_df: DataFrame) -> np.ndarray:
    """Arrow-collect the (vec_id-ordered) quantized sample as an exact
    int-valued float64 matrix. Bounded by TRAIN_CAP rows — the sort
    happens pandas-side after the collect (same total order, one less
    Spark exchange)."""
    pdf = vq_df.toPandas().sort_values("vec_id")
    return np.stack(pdf["vq"].to_numpy()).astype(np.float64)


# Above this many sample x cell score evaluations per Lloyd iteration,
# training assignment runs as an Arrow-batched Spark job (exact integer
# partial sums per batch, HALF-UP mean finished driver-side) instead of
# one driver-side matmul. The arithmetic is IDENTICAL — integer sums
# are order-independent — so the oracle parity is untouched; what
# changes is that the 366-Gflop sf10 training (200k x 3576 cells x 8
# iterations) spreads over the executor pool instead of pinning one
# driver core for minutes (measured: single-threaded BLAS here).
TRAIN_DRIVER_MAX_SCORES = 50_000_000


def train_ivf(vq_df: DataFrame, n_corpus: int) -> tuple[np.ndarray, np.ndarray]:
    """Train the codebook from a (vec_id, vq) sample frame, picking the
    driver-matmul or distributed path by per-iteration score volume —
    identical results either way (exact integer arithmetic)."""
    n_sample = min(n_corpus, -(-n_corpus // train_stride(n_corpus)) + 1)
    if n_sample * k_cells_for(n_corpus) <= TRAIN_DRIVER_MAX_SCORES:
        return train_codebook(collect_sample(vq_df), n_corpus)
    return train_codebook_spark(vq_df, n_corpus)


def train_codebook_spark(vq_df: DataFrame, n_corpus: int) -> tuple[np.ndarray, np.ndarray]:
    """Distributed twin of :func:`train_codebook`: same init, same
    exact-integer Lloyd updates, same tie rules — the per-iteration
    (sample x K) scoring runs in executors; only (cell, partial integer
    sums, count) rows come back to the driver."""
    import pandas as pd

    sample_sorted = vq_df.orderBy("vec_id").select("vq")
    # init rows: stride over the vec_id-ordered sample (bounded collect
    # of just the K init rows via a rank filter computed driver-side on
    # the bounded sample size)
    m = sample_sorted.count()
    K = k_cells_for(n_corpus)
    stride = max(m // K, 1)
    init = sample_sorted.limit((min(K, -(-m // stride)) - 1) * stride + 1).toPandas()
    C = np.stack(init["vq"].to_numpy()[::stride]).astype(np.float64)[:K]
    ids = np.arange(len(C), dtype=np.int64)
    cached = vq_df.select("vq").persist()
    try:
        for _ in range(IVF_ITERS):
            ids_l, C_l = ids.copy(), C.copy()
            cn = np.sqrt((C_l * C_l).sum(1))

            def part(batches: Iterable, C_l=C_l, cn=cn):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    VQ = np.stack(pdf["vq"].to_numpy()).astype(np.float64)
                    vn = np.sqrt((VQ * VQ).sum(1))
                    asgn = ((VQ @ C_l.T) / vn[:, None] / cn[None, :]).argmax(1)
                    sums = np.zeros_like(C_l)
                    cnt = np.zeros(len(C_l), dtype=np.int64)
                    np.add.at(sums, asgn, VQ)
                    np.add.at(cnt, asgn, 1)
                    hit = cnt > 0
                    yield pd.DataFrame(
                        {
                            "pos": np.nonzero(hit)[0],
                            "sums": [s.astype(np.int64) for s in sums[hit]],
                            "cnt": cnt[hit],
                        }
                    )

            parts = cached.mapInPandas(
                part, "pos int, sums array<long>, cnt long"
            ).toPandas()
            sums = np.zeros_like(C)
            cnt = np.zeros(len(C), dtype=np.float64)
            pos = parts["pos"].to_numpy()
            np.add.at(cnt, pos, parts["cnt"].to_numpy().astype(np.float64))
            np.add.at(sums, pos, np.stack(parts["sums"].to_numpy()).astype(np.float64))
            keep = cnt > 0
            sums, cnt, ids = sums[keep], cnt[keep], ids[keep]
            C = np.sign(sums) * np.floor(
                (2.0 * np.abs(sums) + cnt[:, None]) // (2.0 * cnt[:, None])
            )
    finally:
        cached.unpersist()
    return ids, C


def assign_cells(vq_df: DataFrame, ids: np.ndarray, C: np.ndarray, a: int) -> DataFrame:
    """Multi-assignment of the full corpus: every input row is repeated
    once per admitted cell, with all non-``vq`` columns passed through
    plus the new ``cell`` and ``arank`` (the cell's 0-based rank in the
    row's :func:`top_cells` order). Arrow-batched numpy scoring against
    the (broadcast-by-closure) codebook — the vectorized path for what
    would otherwise be an interpreted higher-order-function fold over
    an n x K crossJoin, and it needs NO shuffle at all.

    Storing ``arank`` in the index costs one int per replica row and
    lets probe-time consumers SLICE a narrower assignment without
    re-scoring the corpus: ``top_cells`` ranks by a full stable
    argsort, so ``arank < r`` of an ``a``-way assignment is exactly the
    ``r``-way assignment for any ``r <= a`` (the embedding-dedup pair
    stage reads ``arank < DEDUP_PAIR_A`` from the ASSIGN_A-replicated
    standing index)."""
    ids_l, C_l, a_l = ids.copy(), C.copy(), a
    out_cols = [c for c in vq_df.columns if c != "vq"]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in vq_df.schema.fields
        if f.name != "vq"
    ) + ", cell bigint, arank int"

    def part(batches: Iterable):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            VQ = np.stack(pdf["vq"].to_numpy()).astype(np.float64)
            cells = top_cells(VQ, ids_l, C_l, a_l)
            out = {c: pdf[c].to_numpy().repeat(a_l) for c in out_cols}
            out["cell"] = cells.reshape(-1)
            out["arank"] = np.tile(np.arange(a_l, dtype=np.int32), len(pdf))
            yield pd.DataFrame(out)

    return vq_df.mapInPandas(part, out_schema)
