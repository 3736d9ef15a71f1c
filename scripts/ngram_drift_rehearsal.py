"""Stale-freq drift in the standing n-gram corpus, measured: extensions
deliberately never re-rank (``extend_ngram_corpus`` — O(batch)), so the
rarest-first prefix ordering degrades as the stale fraction grows. The
COST is purely candidate inflation in the probes (results are exact at
any staleness — the positional prefix guarantee is order-free); this
script measures that inflation per extension wave against a compacted
(fresh-freq) twin of the same corpus, to ground
``ngram_corpus.needs_compact``'s COMPACT_STALE_FRACTION.

Usage: python scripts/ngram_drift_rehearsal.py [sf_dir] (default .scaledata/sf1)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opencypher_datalayer_spark.session import get_spark  # noqa: E402
from opencypher_datalayer_spark.benchqueries.dedup import (  # noqa: E402
    JACCARD_T,
    _shingle_hashes,
)
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore  # noqa: E402
from opencypher_datalayer_spark.operators.ngram_corpus import (  # noqa: E402
    FREQ,
    SHINGLES,
    compact_ngram_corpus,
    extend_ngram_corpus,
    needs_compact,
    probe_near_dups,
    rank_sets,
    read_ngram_corpus,
    write_ngram_corpus,
)
from opencypher_datalayer_spark.operators.staged_verify import (  # noqa: E402
    jaccard_feasible,
)


def count_candidates(spark, adir, sh_new, t) -> tuple[int, int]:
    """(raw candidate join rows, distinct pairs) of the probe's
    candidate stage — the exact cand subexpression of probe_near_dups."""
    art = read_ngram_corpus(spark, adir)
    sets_new = rank_sets(sh_new, F.broadcast(art[FREQ]))
    prefix = sets_new.select(
        "doc_id",
        F.col("n").alias("na"),
        F.posexplode(
            F.expr(f"slice(hs, 1, cast(floor((1.0 - {t}) * n) + 1 as int))")
        ).alias("pa", "h"),
    )
    pos_bound = F.least(F.col("na") - F.col("pa"), F.col("nb"))
    raw = (
        F.broadcast(prefix)
        .alias("a")
        .join(
            art[SHINGLES].select(
                F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), "h"
            ),
            "h",
        )
        .where(jaccard_feasible(pos_bound, F.col("na") + F.col("nb"), t))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
    )
    return raw.count(), raw.dropDuplicates().count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf1"
    t = JACCARD_T
    spark = get_spark(app_name="ngram_drift")
    sh = _shingle_hashes(spark, sf_dir, "md5").localCheckpoint()
    # mod-10 slices: 0-4 base, 5-8 extension waves, 9 the probe batch
    base = sh.where(F.col("doc_id") % 10 <= 4)
    probe_batch = sh.where(F.col("doc_id") % 10 == 9).localCheckpoint()

    root = tempfile.mkdtemp(prefix="ngram_drift_")
    store = ArtifactStore(root)
    kind, key = "ngram_corpus", ("drift",)
    cur = store.get_or_build(kind, key, lambda d: write_ngram_corpus(spark, base, d))

    rows = []
    for wave, mod in enumerate((None, 5, 6, 7, 8)):
        if mod is not None:
            cur = extend_ngram_corpus(
                spark, store, kind, key, sh.where(F.col("doc_id") % 10 == mod)
            )
        sig = needs_compact(cur)
        raw, pairs = count_candidates(spark, cur, probe_batch, t)
        t0 = time.perf_counter()
        out = probe_near_dups(spark, cur, probe_batch, t).count()
        probe_s = time.perf_counter() - t0
        # compacted twin: SAME corpus content, fresh corpus-wide freq
        twin = ArtifactStore(tempfile.mkdtemp(prefix="ngram_drift_twin_"))
        tdir = twin.get_or_build(
            kind,
            key,
            lambda d, cur=cur: write_ngram_corpus(
                spark,
                spark.read.parquet(os.path.join(cur, SHINGLES)).select("doc_id", "h"),
                d,
            ),
        )
        fraw, fpairs = count_candidates(spark, tdir, probe_batch, t)
        rec = {
            "wave": wave,
            **sig,
            "cand_raw": raw,
            "cand_pairs": pairs,
            "fresh_raw": fraw,
            "fresh_pairs": fpairs,
            "inflation_raw": round(raw / max(fraw, 1), 4),
            "probe_s": round(probe_s, 2),
            "probe_rows": out,
        }
        print(json.dumps(rec))
        rows.append(rec)
        shutil.rmtree(twin.root, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
