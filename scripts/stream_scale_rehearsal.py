"""Streaming near-dup filter rehearsal at scale: a REAL rate-limited
Structured Streaming file source (maxFilesPerTrigger=1) through
writeStream.foreachBatch, with compact(below_epoch) interleaved UNDER
arrivals — the production claim VERDICT r8 next #6 asked to exercise
beyond the registry replay. The accepted set must equal the replay
(st_stream_neardup, the driver-oracled path) exactly.

Usage: python scripts/stream_scale_rehearsal.py [sf_dir] [n_batches]
Prints one JSON line with per-epoch timings, compaction timings, file
counts before/after each fold, and the stream-vs-replay verdict.
"""

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators import minhash as mh
from opencypher_datalayer_spark.session import get_spark
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.streaming.neardup import StreamingNearDupFilter


def count_state_files(sigs_dir: str) -> int:
    return sum(
        1
        for dp, _, fs in os.walk(sigs_dir)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf1"
    nbatch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="stream_rehearsal")
    root = tempfile.mkdtemp(prefix="stream_rehearsal_")
    arrivals = os.path.join(root, "arrivals")
    os.makedirs(arrivals)

    # one parquet FILE per arrival batch with strictly increasing
    # mtimes + maxFilesPerTrigger=1: the file source (ordering by
    # modification time) replays the batch sequence one epoch per file
    # — the same wiring tests/test_stream_neardup.py pins at sf0.001
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_docs = docs.count()
    for k in range(nbatch):
        tmp = os.path.join(arrivals, f"_stage{k}")
        docs.where(F.col("doc_id") % nbatch == k).coalesce(1).write.parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dst = os.path.join(arrivals, f"batch{k}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + 600 * k,) * 2)
    flat = arrivals

    filt = StreamingNearDupFilter(spark, os.path.join(root, "state"))
    log = {"sf_dir": sf_dir, "n_docs": n_docs, "epochs": [], "compactions": []}

    def sink(batch, epoch_id):
        t0 = time.perf_counter()
        filt.apply(batch, epoch_id)
        dt = round(time.perf_counter() - t0, 2)
        log["epochs"].append({"epoch": int(epoch_id), "sec": dt})
        if epoch_id % 2 == 1:  # compact mid-stream, under arrivals
            # fold only STRICTLY earlier epochs: the current epoch's
            # checkpoint commit happens after this function returns, so
            # it stays replayable (the bound compact() enforces)
            before = count_state_files(filt.sigs_dir)
            t0 = time.perf_counter()
            filt.compact(below_epoch=int(epoch_id))
            log["compactions"].append(
                {
                    "after_epoch": int(epoch_id),
                    "sec": round(time.perf_counter() - t0, 2),
                    "files_before": before,
                    "files_after": count_state_files(filt.sigs_dir),
                }
            )

    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log["stream_total_sec"] = round(time.perf_counter() - t0, 2)

    streamed = {
        (r.doc_id, r.batch % nbatch)
        for r in filt.kept().select("doc_id", "batch").collect()
    }
    # replay oracle: the registry path (driver-value-oracled vs DuckDB
    # at sf0.01) run with the same batch split
    import opencypher_datalayer_spark.benchqueries.dedup as dd

    t0 = time.perf_counter()
    old = dd.STREAM_NBATCH
    dd.STREAM_NBATCH = nbatch
    try:
        replayed = {
            (r.doc_id, r.batch)
            for r in dd.st_stream_neardup(
                spark, sf_dir, hash_family=mh.ORACLE_HASH_FAMILY
            ).collect()
        }
    finally:
        dd.STREAM_NBATCH = old
    log["replay_sec"] = round(time.perf_counter() - t0, 2)
    log["kept"] = len(streamed)
    log["match"] = streamed == replayed
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(log))
    return 0 if log["match"] and streamed else 1


if __name__ == "__main__":
    sys.exit(main())
