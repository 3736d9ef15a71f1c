"""Standing n-gram corpus artifact: the persisted frames the
incremental near-dup check probes.

``dedup_incremental``'s daily shape is new-batch x standing-corpus —
but until r9 every invocation re-shingled, re-ranked, and re-shuffled
the ENTIRE standing corpus to rebuild four derived frames (shingle
table, document frequencies, ranked sets, stage-A slim payloads):
207.8 s per call at the sf10 rehearsal, of which the new batch itself
accounted for a small fraction. This module materializes those frames
ONCE per corpus version into an ``operators.artifacts`` store entry;
the probe then touches the corpus only through parquet scans.

Layout under the artifact version dir (v2)::

    shingles/   (doc_id, h, n)         distinct 60-bit shingle hashes,
                                        each row carrying the doc's set
                                        size so probe-side feasibility
                                        filters run ON the candidate
                                        join row (no size join)
    freq/       (h, df)                corpus document frequency
    sets/       (doc_id, hs, n)        df-ranked (rarest-first) arrays
    slim/       (doc_id, lo32, dq, n, nh)  stage-A payload
                                        (operators.staged_verify)

Soundness note for consumers: the prefix filter's guarantee is purely
POSITIONAL — if Jaccard(A,B) >= t then at most floor((1-t)|A|) of A's
shingles are unshared, so ANY floor((1-t)|A|)+1 of them contain a
shared one, regardless of order. Ranking by corpus-only df (the only
df a standing artifact can know — the new batch doesn't exist yet) is
therefore a pure performance heuristic, identical in output to the
global-df ranking the one-shot path used. A new-batch shingle absent
from the corpus vocabulary gets df 0 (rarest): it sits early in the
prefix and simply matches nothing.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.staged_verify import slim_payload

_identity: Callable[[DataFrame], DataFrame] = lambda df: df  # noqa: E731

SHINGLES = "shingles"
FREQ = "freq"
SETS = "sets"
SLIM = "slim"


def rank_sets(sh: DataFrame, freq: DataFrame) -> DataFrame:
    """``(doc_id, hs, n)`` with each doc's shingle hashes sorted
    rarest-first by ``freq``'s ``df`` (ties by hash value — the
    deterministic order every consumer shares). A LEFT join so shingles
    outside ``freq``'s vocabulary survive with df 0: ``n`` must be the
    doc's TRUE set size or every Jaccard denominator downstream is
    wrong."""
    return (
        sh.join(freq, "h", "left")
        .select("doc_id", "h", F.coalesce("df", F.lit(0)).alias("df"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h"))).alias("ranked"))
        .select(
            "doc_id",
            F.expr("transform(ranked, x -> x.h)").alias("hs"),
            F.size("ranked").alias("n"),
        )
    )


def write_ngram_corpus(spark: SparkSession, sh: DataFrame, out_dir: str) -> None:
    """Materialize the four standing frames from the corpus shingle
    table ``sh`` (``doc_id``, ``h`` — distinct). Each downstream frame
    reads the previous one back from parquet, so the shingle explode
    runs ONCE (the one-shot path recomputed it per consumer until the
    r6 checkpoint/bucketing work; here the artifact IS the
    materialization). The published shingle table is re-derived from
    the ranked sets so each row carries the doc's set size ``n`` — the
    probe's positional feasibility filter then needs zero extra joins
    (measured 5.8x candidate cut at sf10)."""
    import shutil

    import json

    raw = os.path.join(out_dir, "_shingles_raw")
    sh.write.parquet(raw)
    sh2 = spark.read.parquet(raw)
    sh2.groupBy("h").agg(F.count("*").alias("df")).write.parquet(
        os.path.join(out_dir, FREQ)
    )
    freq = spark.read.parquet(os.path.join(out_dir, FREQ))
    rank_sets(sh2, freq).write.parquet(os.path.join(out_dir, SETS))
    sets = spark.read.parquet(os.path.join(out_dir, SETS))
    sets.select("doc_id", "n", F.explode("hs").alias("h")).write.parquet(
        os.path.join(out_dir, SHINGLES)
    )
    slim_payload(sets).write.parquet(os.path.join(out_dir, SLIM))
    shutil.rmtree(raw, ignore_errors=True)
    # drift bookkeeping for needs_compact: n_ranked = docs whose ranking
    # saw the full corpus vocabulary (everything, at build time)
    n_docs = sets.count()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"n_docs": int(n_docs), "n_ranked": int(n_docs)}, f)


def read_ngram_corpus(spark: SparkSession, adir: str) -> dict[str, DataFrame]:
    """The four standing frames of a committed artifact version."""
    return {
        name: spark.read.parquet(os.path.join(adir, name))
        for name in (SHINGLES, FREQ, SETS, SLIM)
    }


def extend_ngram_corpus(spark: SparkSession, store, kind: str, key: tuple, sh_new: DataFrame) -> str:
    """Append a batch of NEW docs (``sh_new``: distinct ``(doc_id, h)``
    rows, doc_ids disjoint from the standing corpus — the caller's
    contract, e.g. the survivors a near-dup filter accepted) to the
    standing artifact as a NEW COMMITTED VERSION without rewriting the
    standing data: the prior version's files are hard-linked
    (``ArtifactStore.commit_extension``) and only the delta parquet is
    written.

    The ``freq`` table is deliberately left STALE: document-frequency
    ranking is a probe-ordering heuristic whose soundness argument is
    order-free (module docstring), so extensions stay cheap —
    O(batch), never O(corpus). Rankings drift as the corpus grows;
    :func:`compact_ngram_corpus` is the periodic re-derivation (the
    once-a-day maintenance action, like the graph store's
    ``compact()``)."""
    def build(tmp: str) -> None:
        import json

        freq = spark.read.parquet(os.path.join(tmp, FREQ))
        # materialize once: three delta frames derive from it (writing
        # and re-deriving from the full dir would re-rank the standing
        # docs too)
        sets_new = rank_sets(sh_new, freq).localCheckpoint()
        sets_new.write.mode("append").parquet(os.path.join(tmp, SETS))
        sets_new.select("doc_id", "n", F.explode("hs").alias("h")).write.mode(
            "append"
        ).parquet(os.path.join(tmp, SHINGLES))
        slim_payload(sets_new).write.mode("append").parquet(
            os.path.join(tmp, SLIM)
        )
        # drift bookkeeping: the batch ranked with a STALE freq — count
        # it in n_docs but not n_ranked. REMOVE before rewriting: the
        # path is a hard link into the prior committed version.
        meta_p = os.path.join(tmp, "meta.json")
        meta = {}
        if os.path.exists(meta_p):
            with open(meta_p) as f:
                meta = json.load(f)
            os.remove(meta_p)
        nb = sets_new.count()
        meta["n_docs"] = int(meta.get("n_docs", 0)) + int(nb)
        meta.setdefault("n_ranked", 0)
        with open(meta_p, "w") as f:
            json.dump(meta, f)

    return store.commit_extension(kind, key, build)


def probe_near_dups(
    spark: SparkSession,
    adir: str,
    sh_new: DataFrame,
    t: float,
    hint_prefix: Callable[[DataFrame], DataFrame] | None = None,
    hint_freq: Callable[[DataFrame], DataFrame] = _identity,
    hint_slim: Callable[[DataFrame], DataFrame] = _identity,
    hint_sets: Callable[[DataFrame], DataFrame] = _identity,
) -> DataFrame:
    """Near-dup probe of a NEW batch against a standing corpus artifact
    version ``adir``: one ``(new_doc, dup_of, jaccard)`` row per pair
    with shingle Jaccard >= ``t`` (rounded to 6 places, the emit
    predicate every consumer of this family shares).

    ``sh_new``: the batch's distinct ``(doc_id, h)`` shingle hashes
    (``operators.minhash.shingle_hashes(...).dropDuplicates()`` or the
    registry's ``_shingle_hashes``). The corpus is touched ONLY through
    parquet scans of the artifact — candidate volume is new x
    corpus-df, never corpus^2, so at 100 TB the standing corpus is
    probed, not self-joined.

    Prefix soundness (one-sided): Jaccard >= t implies |B| >= t|A| and
    overlap >= t|A|, so at most floor((1-t)|A|) of A's shingles are
    unshared — a shared token must land in A's first
    floor((1-t)|A|)+1 in ANY order (the artifact's corpus-df ranking,
    stale or fresh, is a pure heuristic — module docstring). Each
    prefix row carries its 0-based rank ``pa`` and set size ``na`` for
    the one-sided AllPairs position filter AT the join: the FIRST
    shared prefix token of a qualifying pair has every earlier a-token
    unshared, so overlap <= least(na - pa, nb) and that row survives
    the per-row gate (measured 5.8x candidate cut at sf10).
    Verification is the shared staged engine
    (``operators.staged_verify``) in its asymmetric form: batch side
    live, corpus side from the artifact's persisted slim/sets frames.

    ``hint_prefix`` pins the probe join's build side (default:
    ``F.broadcast`` — the new batch is small by construction in the
    ingest shape; pass a ``shuffle_hash`` hint for mega-batches).
    Catalyst MUST NOT choose here: its estimate for the corpus shingle
    scan is optimistic and at sf10 it auto-broadcast the 150M-row
    corpus side. The other hints plug corpus-size knowledge into the
    verify joins (identity = let AQE decide)."""
    from opencypher_datalayer_spark.operators.staged_verify import (
        jaccard_feasible,
        slim_payload,
        staged_verify,
    )

    art = read_ngram_corpus(spark, adir)
    sets_new = rank_sets(sh_new, hint_freq(art[FREQ]))
    new_prefix = sets_new.select(
        "doc_id",
        F.col("n").alias("na"),
        F.posexplode(
            F.expr(f"slice(hs, 1, cast(floor((1.0 - {t}) * n) + 1 as int))")
        ).alias("pa", "h"),
    )
    probe = (F.broadcast if hint_prefix is None else hint_prefix)(new_prefix)
    pos_bound = F.least(F.col("na") - F.col("pa"), F.col("nb"))
    from opencypher_datalayer_spark.operators.scale import parallel_dedup

    # parallel_dedup, not plain dropDuplicates: the verify's per-row
    # work is ~1000x the candidate bytes and AQE's bytes-based coalesce
    # would serialize it on a handful of cores (scale.parallel_dedup)
    cand = parallel_dedup(
        probe.alias("a")
        .join(
            art[SHINGLES].select(
                F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "h"
            ),
            "h",
        )
        .where(jaccard_feasible(pos_bound, F.col("na") + F.col("nb"), t))
        .select(F.col("doc_id").alias("doc_a"), "doc_b"),
        "doc_a",
        "doc_b",
    )
    exact = staged_verify(
        cand,
        sets_new,
        lambda ub, na, nb: jaccard_feasible(ub, na + nb, t),
        sets_b=art[SETS],
        slim_a=slim_payload(sets_new),
        slim_b=art[SLIM],
        hint_slim=hint_slim,
        hint_sets=hint_sets,
    )
    return (
        exact.withColumn(
            "jaccard", F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6)
        )
        .where(F.col("jaccard") >= t)
        .select(
            F.col("doc_a").alias("new_doc"), F.col("doc_b").alias("dup_of"), "jaccard"
        )
        .orderBy("new_doc", "dup_of")
    )


# Advisory boundary for needs_compact: fraction of the corpus ranked
# with a stale document-frequency table (extensions never re-rank).
# The measured effect is PURELY candidate inflation in the prefix
# probes — results stay exact at any staleness (module docstring), and
# the sf1 rehearsal (scripts/ngram_drift_rehearsal.py, SCALE.md
# §ngram-drift) puts numbers on how much inflation a given stale
# fraction costs on a stationary corpus.
COMPACT_STALE_FRACTION = 0.5


def needs_compact(adir: str) -> dict:
    """Advisory compact signal for a standing n-gram corpus version:
    what fraction of its documents were ranked against a
    document-frequency table that predates them (every extension batch
    — ``extend_ngram_corpus`` deliberately leaves ``freq`` stale so
    extension stays O(batch)). Costs one meta.json read. Returns
    ``{"n_docs", "n_ranked", "stale_fraction", "compact_due"}``; a
    pre-r10 version without meta reports ``stale_fraction`` None and
    never fires (unknown is not actionable)."""
    import json

    try:
        with open(os.path.join(adir, "meta.json")) as f:
            meta = json.load(f)
    except OSError:
        return {"n_docs": None, "n_ranked": None, "stale_fraction": None, "compact_due": False}
    n_docs = int(meta.get("n_docs", 0))
    n_ranked = int(meta.get("n_ranked", 0))
    stale = 1.0 - (n_ranked / n_docs) if n_docs else 0.0
    return {
        "n_docs": n_docs,
        "n_ranked": n_ranked,
        "stale_fraction": round(stale, 4),
        "compact_due": stale >= COMPACT_STALE_FRACTION,
    }


def compact_ngram_corpus(
    spark: SparkSession, store, kind: str, key: tuple, retries: int = 5
) -> str:
    """Re-derive the whole artifact from the current version's shingle
    rows — fresh corpus-wide ``freq`` and re-ranked sets — as a new
    committed version (one corpus pass; restores the rarest-first
    probe-ordering quality that extensions let drift). Old versions
    are reclaimed by ``store.sweep``. Publishes via
    ``store.commit_if_current``: the rewrite is derived from a READ of
    the base version, so an extension committed between the read and
    the publish must not be erased; on conflict the compact re-reads
    the grown shingle set and re-derives."""
    from opencypher_datalayer_spark.operators.artifacts import ExtensionConflict

    for _ in range(retries + 1):
        base = store.current_version(kind, key)
        if base is None:
            raise FileNotFoundError(f"no committed version to compact: {kind} {key!r}")
        cur = store.current_dir(kind, key)
        sh = (
            spark.read.parquet(os.path.join(cur, SHINGLES))
            .select("doc_id", "h")
            .localCheckpoint()  # decouple from the files sweep may reclaim
        )
        try:
            return store.commit_if_current(
                kind, key, lambda tmp: write_ngram_corpus(spark, sh, tmp), base
            )
        except ExtensionConflict:
            continue  # an extender won: re-derive over the grown corpus
    raise ExtensionConflict(
        f"compact of {kind} {key!r} lost {retries + 1} consecutive publish races"
    )
