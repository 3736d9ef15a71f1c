"""BM25 maintenance-advisory rehearsal: the clean-ingest sink driven
through 64+ extension generations with ``maintain_if_due()`` polled
between epochs — NO manual compaction anywhere — versus an identical
unmaintained chain. VERDICT r12 next #2's done criterion: probe
latency stays flat through the chain when the advisory is wired, while
the control shows the measured generation-drift cliff (flat <=16
generations, +78% at 32, SCALE.md §bm25-generation-drift).

Usage: python scripts/bm25_maintain_rehearsal.py [sf_dir] [n_epochs]
Prints one JSON line: per-checkpoint probe latencies (min-of-2) with
the live generation counters for both chains, plus the flatness
verdict (maintained max/min probe ratio).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.bm25_index import bm25_topk, index_meta
from opencypher_datalayer_spark.session import get_spark
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.streaming.clean_ingest import StreamingCleanIngest

PROBE_EVERY = 8


def probe_s(spark, adir, queries) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        bm25_topk(spark, adir, queries, k=10).count()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 72
    spark = get_spark(app_name="bm25_maintain_rehearsal")
    root = tempfile.mkdtemp(prefix="bm25_maintain_")

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    # epoch k gets the doc_id % n_epochs == k slice — every epoch a
    # non-empty extension, so generations == epochs ingested
    slices = [
        docs.where(F.col("doc_id") % n_epochs == k).localCheckpoint()
        for k in range(n_epochs)
    ]
    queries = spark.createDataFrame(
        [(0, ["data", "model", "learning"]), (1, ["quality", "corpus", "token"])],
        "q_id bigint, toks array<string>",
    ).localCheckpoint()

    out = {"sf_dir": sf_dir, "n_epochs": n_epochs, "checkpoints": []}
    sinks = {}
    for mode in ("maintained", "control"):
        sinks[mode] = StreamingCleanIngest(
            spark,
            os.path.join(root, mode, "state"),
            ArtifactStore(os.path.join(root, mode, "store")),
            "bm25_index",
            ("r",),
            min_tokens=1,
            min_alpha=0.0,
        )
    for epoch in range(n_epochs):
        for mode, sink in sinks.items():
            sink.apply(slices[epoch], epoch)
            if mode == "maintained":
                sink.maintain_if_due()  # the wired advisory — nothing manual
        if (epoch + 1) % PROBE_EVERY == 0 or epoch == n_epochs - 1:
            cp = {"epoch": epoch + 1}
            for mode, sink in sinks.items():
                adir = sink.index_dir()
                m = index_meta(adir)
                cp[mode] = {
                    "probe_s": round(probe_s(spark, adir, queries), 3),
                    "generations": m.get("generations"),
                    "postings_generations": m.get("postings_generations"),
                }
            out["checkpoints"].append(cp)
            print(f"epoch {epoch + 1}: {cp}", file=sys.stderr, flush=True)

    # drift metric: mean of the last 3 checkpoints over the first 3 —
    # robust to single-probe session noise (max/min flagged a 0.75 s
    # outlier as drift while the trend was flat)
    def drift(xs):
        k = min(3, len(xs))
        return round(sum(xs[-k:]) / sum(xs[:k]), 3)

    lat = [c["maintained"]["probe_s"] for c in out["checkpoints"]]
    ctl = [c["control"]["probe_s"] for c in out["checkpoints"]]
    out["maintained_drift"] = drift(lat)
    out["control_drift"] = drift(ctl)
    out["flat"] = out["maintained_drift"] < 1.25
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
