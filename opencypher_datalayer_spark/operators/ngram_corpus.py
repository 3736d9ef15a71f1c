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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.staged_verify import slim_payload

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


def read_ngram_corpus(spark: SparkSession, adir: str) -> dict[str, DataFrame]:
    """The four standing frames of a committed artifact version."""
    return {
        name: spark.read.parquet(os.path.join(adir, name))
        for name in (SHINGLES, FREQ, SETS, SLIM)
    }
