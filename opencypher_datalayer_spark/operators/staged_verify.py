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
