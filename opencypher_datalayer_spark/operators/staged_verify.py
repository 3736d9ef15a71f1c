"""Staged exact set-overlap verification — the shared verify engine of
the n-gram similarity family (Jaccard / containment / incremental),
promoted to a pure frame->frame operator so library callers get it
without the registry's ``(spark, sf_dir)`` adapters (the same promotion
``operators.minhash`` got when the streaming filter needed it).

Input contract: a ``sets`` frame of ``(doc_id, hs array<long>, n int)``
— each doc's distinct 60-bit element hashes (any order) and set size —
plus a candidate pair frame ``(doc_a, doc_b)``. Output: one row per
candidate that SURVIVES a sound overlap upper bound, with the exact
intersection size ``i`` and both set sizes.

Two stages (the r7 redesign; see the ``dedup_ngram_jaccard`` docstring
for the measured history):

- STAGE A streams every candidate through joins against SLIM frames
  carrying only ``(lo32, dq, n, nh)``: the below-``VERIFY_SPLIT``
  quarter of each set truncated to distinct int32 plus set sizes and
  the per-doc truncation-collapse count ``dq``. Because lo/hi
  partition the sets BY VALUE, ``|A.B| = |A_lo.B_lo| + |A_hi.B_hi|``
  exactly, so ``|T(A_lo).T(B_lo)| + least(dq_a, dq_b) +
  min(|A_hi|,|B_hi|)`` is a TRUE upper bound on the overlap (the
  ``dq`` slack compensates truncation collapses among shared values —
  ADVICE r7 #1; ``tests/test_dedup_bounds.py`` pins it with a
  constructed collision).
- STAGE B joins only the survivors (measured ~0.1%) against the full
  64-bit arrays for ONE exact ``array_intersect`` per surviving pair —
  truncation never touches an emitted value.

The engine is hint-agnostic: callers pass ``hint_slim`` / ``hint_sets``
callables (identity, ``F.broadcast``, or a ``shuffle_hash`` hint) so
the registry's corpus-size gates and a library user's own knowledge
plug in without the operator hard-coding either.

Asymmetric shape: ``sets_b``/``slim_b`` may come from a DIFFERENT
frame than the A side — the incremental (new-batch x standing-corpus)
path probes persisted corpus artifacts with a freshly-computed batch
side, never recomputing the corpus.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Hash-value split point: the first quarter of the 60-bit hash space.
# Uniform hashing puts ~25% of each set below it; the quarter-size
# lo-intersect refutes nearly all false candidates before the hi arrays
# are touched.
VERIFY_SPLIT = 1 << 58

_identity: Callable[[DataFrame], DataFrame] = lambda df: df  # noqa: E731


def jaccard_feasible(bound, s, t: float):
    """True iff an overlap upper-bounded by ``bound`` (integer column)
    could still satisfy the final emit predicate
    ``round(i/(s-i),6) >= t`` for a pair with total size ``s``. This is
    the SAME rounded predicate the emit uses, applied to the bound —
    x/(s-x) is increasing in x, so it can never be stricter than emit.
    Deliberately NOT ``bound >= ceil(t/(1+t)*s)``: the IEEE double
    0.8/1.8 rounds above 4/9, so that ceil overshoots by 1 whenever
    s % 9 == 0 and drops threshold-exact pairs the oracle emits
    (ADVICE r6 #1). Shared by the AllPairs candidate filters (batch
    self-join and incremental probe) and the staged-verify skip gate."""
    return F.round(bound / (s - bound), 6) >= F.lit(t)


def slim_payload(sets: DataFrame) -> DataFrame:
    """Stage-A payload ``(doc_id, lo32, dq, n, nh)`` from a
    ``(doc_id, hs, n)`` sets frame. Persisted as-is by the incremental
    corpus artifact so warm probes skip the array transforms."""
    lo32 = F.transform(
        F.filter("hs", lambda x: x < F.lit(VERIFY_SPLIT)),
        lambda x: x.bitwiseAND(F.lit(0x7FFFFFFF)).cast("int"),
    )
    nh = F.size(F.filter("hs", lambda x: x >= F.lit(VERIFY_SPLIT)))
    return sets.select(
        "doc_id", lo32.alias("lo32raw"), F.col("n"), nh.alias("nh")
    ).select(
        "doc_id",
        F.array_distinct("lo32raw").alias("lo32"),
        (F.size("lo32raw") - F.size(F.array_distinct("lo32raw"))).alias("dq"),
        "n",
        "nh",
    )


def staged_verify(
    cand: DataFrame,
    sets_a: DataFrame,
    gate: Callable,
    sets_b: DataFrame | None = None,
    slim_a: DataFrame | None = None,
    slim_b: DataFrame | None = None,
    hint_slim: Callable[[DataFrame], DataFrame] = _identity,
    hint_sets: Callable[[DataFrame], DataFrame] = _identity,
) -> DataFrame:
    """Exact overlap for the candidates that survive the sound slim
    bound. ``gate(ub, na, nb)`` decides stage-A feasibility and must
    never be stricter than the caller's emit predicate (pass the exact
    rounded emit predicate applied to the bound — see
    ``_jaccard_feasible``'s float-ceil cautionary tale).

    Returns ``(doc_a, doc_b, na, nb, i)``.
    """
    sets_b = sets_a if sets_b is None else sets_b
    slim_a = slim_payload(sets_a) if slim_a is None else slim_a
    slim_b = slim_payload(sets_b) if slim_b is None else slim_b

    sa = slim_a.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lo32").alias("lo_a"),
        F.col("dq").alias("dqa"),
        F.col("n").alias("na"),
        F.col("nh").alias("nha"),
    )
    sb = slim_b.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lo32").alias("lo_b"),
        F.col("dq").alias("dqb"),
        F.col("n").alias("nb"),
        F.col("nh").alias("nhb"),
    )
    ub = (
        F.size(F.array_intersect("lo_a", "lo_b"))
        + F.least("dqa", "dqb")
        + F.least("nha", "nhb")
    )
    feasible = (
        cand.join(hint_slim(sa), "doc_a")
        .join(hint_slim(sb), "doc_b")
        .where(gate(ub, F.col("na"), F.col("nb")))
        .select("doc_a", "doc_b")
    )
    ea = sets_a.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("na")
    )
    eb = sets_b.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("nb")
    )
    return (
        feasible.join(hint_sets(ea), "doc_a")
        .join(hint_sets(eb), "doc_b")
        .withColumn("i", F.size(F.array_intersect("hs_a", "hs_b")))
        .select("doc_a", "doc_b", "na", "nb", "i")
    )


# -- vectorized stage A (r13, VERDICT r12 next #3) -----------------------
#
# At sf10 the JVM stage A was the dedup_ngram_jaccard tail: 117.8M
# candidate pairs each paying a boxed per-row array_intersect against
# broadcast slim frames (~97 s), downstream of a 117.8M-row
# dropDuplicates shuffle (~60 s with the join). This path replaces both
# for corpora whose slim payload fits a bounded driver collect: the
# slim frame becomes a numpy CSR broadcast ONCE per python worker, the
# RAW (pre-dedup) pair stream ships as pure int64 columns through
# mapInPandas, and the lo-intersect is computed for a whole Arrow batch
# at once — pad both sides' sorted lo arrays with non-colliding
# sentinels, np.sort the concatenation row-wise, count equal-adjacent
# slots (exact multiset-intersection of distinct-element sets). The
# survivor stream is ~1e-3 of the input, so the pair dedup moves AFTER
# the gate and shuffles thousands of rows instead of hundreds of
# millions.
#
# Soundness: the bound is IDENTICAL to the JVM stage A
# (|T(A_lo) . T(B_lo)| + least(dq) + least(nh)); only the gate's
# rounding differs — numpy evaluates ``ub/(s-ub) >= t - NP_GATE_EPS``
# which is strictly MORE permissive than the JVM's
# ``F.round(ub/(s-ub), 6) >= t`` (HALF_UP at 6dp accepts x only when
# x >= t - 5.0000001e-7 > t - NP_GATE_EPS), so no emittable pair is
# ever dropped and the extra survivors are re-judged exactly in
# stage B. Sentinels are negative ints (distinct per slot, even for
# the A side / odd for the B side) while real lo32 values are
# masked to non-negative int32 — no collision is possible.

NP_GATE_EPS = 1e-6
# slim CSR driver-collect cap: values + offsets + scalars, int32/int64.
# Above it the JVM broadcast/shuffle stage A runs unchanged (the slim
# frame grows O(corpus); at cluster scale this is the same "fits one
# worker" gate every broadcast path in the repo degrades through).
SLIM_NP_MAX_BYTES = 256 * 1024 * 1024


def slim_csr(slim_rows) -> dict:
    """Numpy CSR of a collected slim payload: doc_id-sorted flat lo32
    values + offsets + per-doc (dq, n, nh) vectors, plus the tier-1
    bucket-count matrix (``NP_BUCKETS`` int16 counts of each doc's lo32
    values by ``value & (NP_BUCKETS-1)``). ``ids.searchsorted`` maps a
    doc_id column to row indices."""
    import numpy as np

    rows = sorted(slim_rows, key=lambda r: r["doc_id"])
    ids = np.fromiter((r["doc_id"] for r in rows), dtype=np.int64, count=len(rows))
    lens = np.fromiter((len(r["lo32"]) for r in rows), dtype=np.int32, count=len(rows))
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    vals = np.empty(int(offs[-1]), dtype=np.int32)
    for i, r in enumerate(rows):
        a = np.asarray(r["lo32"], dtype=np.int32)
        a.sort()  # row-wise sort once, reused by every tier-2 batch
        vals[offs[i]:offs[i + 1]] = a
    cnt = np.zeros((len(rows), NP_BUCKETS), dtype=np.int16)
    if len(vals):
        row_of = np.repeat(np.arange(len(rows), dtype=np.int64), lens)
        np.add.at(cnt, (row_of, vals & (NP_BUCKETS - 1)), 1)
    return {
        "ids": ids,
        "offs": offs,
        "vals": vals,
        "cnt": cnt,
        "wmax": int(lens.max()) if len(lens) else 0,
        "dq": np.fromiter((r["dq"] for r in rows), dtype=np.int32, count=len(rows)),
        "n": np.fromiter((r["n"] for r in rows), dtype=np.int32, count=len(rows)),
        "nh": np.fromiter((r["nh"] for r in rows), dtype=np.int32, count=len(rows)),
    }


# Tier-1 bucket fan-out: 128 int16 counts per doc (~256 B). Per-bucket
# ``min(count_a, count_b)`` summed is a SOUND overlap bound (the
# intersection's distinct values land in both docs' counts of their
# bucket), ~250x cheaper per pair than the tier-2 sort intersect
# (measured 17 ms vs 4.2 s per 100k pairs) — it rejects the
# near-disjoint bulk so the sort runs only on its survivors.
NP_BUCKETS = 128


def _padded_gather(csr: dict, idx, width: int):
    """(len(idx), width) int32 matrix of the CSR rows padded with -1
    (callers overwrite pad slots with their own sentinels)."""
    import numpy as np

    offs, vals = csr["offs"], csr["vals"]
    starts = offs[idx]
    lens = (offs[idx + 1] - starts).astype(np.int64)
    pos = np.arange(width, dtype=np.int64)[None, :]
    if len(vals) == 0:  # empty corpus slice: all-pad rows
        return np.full((len(idx), width), -1, dtype=np.int32), lens
    take = np.minimum(starts[:, None] + pos, len(vals) - 1)
    out = vals[take]
    out[pos >= lens[:, None]] = -1
    return out, lens


def _lo_intersect(csr: dict, ia, ib):
    """Exact |T(A_lo) . T(B_lo)| per pair, vectorized: pad both sides'
    (pre-sorted) lo arrays to the batch width with non-colliding
    sentinels (negative int32, even slots for A / odd for B — real
    values are masked non-negative), sort the concatenation row-wise,
    count equal-adjacent slots (exact for distinct-element sets)."""
    import numpy as np

    offs = csr["offs"]
    w = max(
        int((offs[ia + 1] - offs[ia]).max(initial=1)),
        int((offs[ib + 1] - offs[ib]).max(initial=1)),
    )
    A, la = _padded_gather(csr, ia, w)
    B, lb = _padded_gather(csr, ib, w)
    pos = np.arange(w, dtype=np.int32)
    A = np.where(pos[None, :] >= la[:, None], (-2 * pos - 2)[None, :], A)
    B = np.where(pos[None, :] >= lb[:, None], (-2 * pos - 3)[None, :], B)
    C = np.concatenate([A, B], axis=1)
    C.sort(axis=1)
    return (C[:, 1:] == C[:, :-1]).sum(axis=1).astype(np.int64)


def stage_a_np_survivors(
    cand: DataFrame, csr_bc, np_gate
) -> DataFrame:
    """Stage-A survivors of a (possibly duplicate-bearing) candidate
    pair stream, computed by the two-tier vectorized kernel: tier 1
    gates every pair on the bucket-count bound (cheap, looser), tier 2
    re-gates tier-1 survivors on the exact lo-intersect bound (the JVM
    stage A's bound). ``csr_bc`` is a ``SparkContext.broadcast`` of
    :func:`slim_csr`'s dict; ``np_gate`` maps ``(ub, n_a, n_b)`` numpy
    vectors to a boolean keep-mask and must be at least as permissive
    as the caller's emit predicate (see ``NP_GATE_EPS``). Both tiers'
    bounds dominate the true overlap, and the gate is monotone in the
    bound, so no emittable pair is dropped at either tier. Duplicate
    input pairs may survive as duplicates — dedup AFTER this gate, at
    survivor scale."""
    import numpy as np

    def kernel(batches):
        csr = csr_bc.value
        ids = csr["ids"]
        for pdf in batches:
            if not len(pdf):
                continue
            da = pdf["doc_a"].to_numpy(dtype=np.int64)
            db = pdf["doc_b"].to_numpy(dtype=np.int64)
            ia = np.minimum(ids.searchsorted(da), len(ids) - 1)
            ib = np.minimum(ids.searchsorted(db), len(ids) - 1)
            if not (np.array_equal(ids[ia], da) and np.array_equal(ids[ib], db)):
                raise ValueError(
                    "candidate doc_id missing from the slim CSR — the "
                    "pair stream and the artifact must share one corpus"
                )
            slack = np.minimum(csr["dq"][ia], csr["dq"][ib]).astype(
                np.int64
            ) + np.minimum(csr["nh"][ia], csr["nh"][ib])
            na = csr["n"][ia].astype(np.int64)
            nb = csr["n"][ib].astype(np.int64)
            ub1 = (
                np.minimum(csr["cnt"][ia], csr["cnt"][ib]).sum(
                    axis=1, dtype=np.int64
                )
                + slack
            )
            t1 = np.flatnonzero(np_gate(ub1, na, nb))
            if not len(t1):
                continue
            ub2 = _lo_intersect(csr, ia[t1], ib[t1]) + slack[t1]
            keep = t1[np_gate(ub2, na[t1], nb[t1])]
            yield pdf.iloc[keep][["doc_a", "doc_b"]]

    return cand.select("doc_a", "doc_b").mapInPandas(
        kernel, "doc_a long, doc_b long"
    )


def exact_overlap(
    feasible: DataFrame,
    sets_a: DataFrame,
    sets_b: DataFrame | None = None,
    hint_sets: Callable[[DataFrame], DataFrame] = _identity,
) -> DataFrame:
    """Stage B alone — the exact full-array intersect for a
    (deduplicated) survivor pair frame; the fused :func:`staged_verify`
    tail, exposed so the vectorized stage A composes with it."""
    sets_b = sets_a if sets_b is None else sets_b
    ea = sets_a.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("n").alias("na")
    )
    eb = sets_b.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("n").alias("nb")
    )
    return (
        feasible.join(hint_sets(ea), "doc_a")
        .join(hint_sets(eb), "doc_b")
        .withColumn("i", F.size(F.array_intersect("hs_a", "hs_b")))
        .select("doc_a", "doc_b", "na", "nb", "i")
    )
