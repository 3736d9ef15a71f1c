"""Per-stage wall-clock decomposition of the CURRENT (r14)
st_stream_clean_ingest flow at sf0.1 (guide §1: measure first).
Mirrors benchqueries.curation.st_stream_clean_ingest stage by stage —
the pre-signed replay, per-epoch apply_sigs internals, and the final
probe — with job counts per stage."""

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

TIMES: dict[str, float] = {}
JOBS: dict[str, int] = {}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from opencypher_datalayer_spark.benchqueries.curation import (
        CLEAN_MIN_ALPHA,
        CLEAN_MIN_TOKENS,
        _tokens,
    )
    from opencypher_datalayer_spark.benchqueries.dedup import (
        STREAM_NBATCH,
        WORK_MINHASH,
        _docs_fingerprint,
    )
    from opencypher_datalayer_spark.benchqueries.text import BM25_NQ, BM25_TOPK
    from opencypher_datalayer_spark.operators import minhash as mh
    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.bm25_index import SCALE, bm25_scores
    from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation
    from opencypher_datalayer_spark.operators.textkit import quality_floor
    from opencypher_datalayer_spark.session import get_spark
    from opencypher_datalayer_spark.sources.tables import load_table
    from opencypher_datalayer_spark.streaming.clean_ingest import StreamingCleanIngest

    spark = get_spark(app_name="profile_stream_clean_r14")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def max_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    class clock:
        def __init__(self, key):
            self.key = key

        def __enter__(self):
            self.t0 = time.perf_counter()
            self.j0 = max_job_id()

        def __exit__(self, *a):
            TIMES[self.key] = TIMES.get(self.key, 0.0) + time.perf_counter() - self.t0
            JOBS[self.key] = JOBS.get(self.key, 0) + max_job_id() - self.j0

    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    family = "md5"
    reps = int(os.environ.get("PROFILE_REPS", "3"))
    for rep in range(reps):
        TIMES.clear()
        JOBS.clear()
        t_all = time.perf_counter()
        docs = rebalance_for_inflation(
            load_table(spark, "documents", sf_dir).select("doc_id", "text"),
            work_per_row=WORK_MINHASH,
        )
        digest = hashlib.md5(
            repr((_docs_fingerprint(sf_dir), family, rep)).encode()
        ).hexdigest()[:10]
        root = os.path.join(
            tempfile.gettempdir(), f"prof_clean14_{digest}_p{os.getpid()}"
        )
        shutil.rmtree(root, ignore_errors=True)
        sink = StreamingCleanIngest(
            spark,
            os.path.join(root, "state"),
            ArtifactStore(os.path.join(root, "store")),
            "bm25_index",
            ("stream",),
            CLEAN_MIN_TOKENS,
            CLEAN_MIN_ALPHA,
            hash_family=family,
        )
        with clock("1_sig_all_ckpt"):
            clean_all = docs.where(quality_floor(CLEAN_MIN_TOKENS, CLEAN_MIN_ALPHA))
            sig_all = mh.signatures_for(clean_all, family).localCheckpoint()
        with clock("2_counts_groupby"):
            counts = {
                int(r["k"]): int(r["c"])
                for r in sig_all.groupBy(
                    (F.col("doc_id") % STREAM_NBATCH).alias("k")
                ).agg(F.count("*").alias("c")).collect()
            }
        # per-epoch, instrumented inside the sink by monkey-wrapping
        from opencypher_datalayer_spark.streaming import neardup as nd

        orig_dba = nd.dedup_batch_against
        orig_kept_drv = sink.filter._write_kept_driver_side

        def timed_dba(*a, **kw):
            with clock("3_pairs_fused_join"):
                return orig_dba(*a, **kw)

        def timed_kept(*a, **kw):
            with clock("5_kept_driver_write"):
                return orig_kept_drv(*a, **kw)

        nd.dedup_batch_against = timed_dba
        sink.filter._write_kept_driver_side = timed_kept

        from opencypher_datalayer_spark.operators import bm25_index as bi

        orig_extend = bi.extend_bm25_index
        orig_write = bi.write_bm25_index

        def timed_extend(*a, **kw):
            with clock("6_bm25_extend"):
                return orig_extend(*a, **kw)

        def timed_write(*a, **kw):
            with clock("6_bm25_write0"):
                return orig_write(*a, **kw)

        import opencypher_datalayer_spark.streaming.clean_ingest as ci

        ci.extend_bm25_index = timed_extend
        ci.write_bm25_index = timed_write

        try:
            for k in range(STREAM_NBATCH):
                with clock("E_epoch_total"):
                    sink.apply_sigs(
                        docs.where(F.col("doc_id") % STREAM_NBATCH == k),
                        sig_all.where(F.col("doc_id") % STREAM_NBATCH == k),
                        k,
                        batch_rows=counts.get(k, 0),
                    )
        finally:
            nd.dedup_batch_against = orig_dba
            ci.extend_bm25_index = orig_extend
            ci.write_bm25_index = orig_write

        with clock("7_probe"):
            adir = sink.index_dir()
            queries = (
                docs.join(sink.kept().select("doc_id"), "doc_id")
                .orderBy("doc_id")
                .limit(BM25_NQ)
                .select(
                    F.col("doc_id").alias("q_id"), _tokens(F.col("text")).alias("toks")
                )
            )
            scored = bm25_scores(spark, adir, queries).where(
                F.col("doc_id") != F.col("q_id")
            )
            from pyspark.sql import Window

            w = Window.partitionBy("q_id").orderBy(
                F.col("s_int").desc(), F.col("doc_id").asc()
            )
            (
                scored.withColumn("rk", F.row_number().over(w))
                .where(F.col("rk") <= BM25_TOPK)
                .withColumn(
                    "score",
                    F.round(F.col("s_int").cast("double") / F.lit(float(SCALE)), 6),
                )
                .select("q_id", "doc_id", "score", "rk")
                .orderBy("q_id", "rk")
                .localCheckpoint()
            ).count()
        total = time.perf_counter() - t_all
        print(f"--- rep {rep}: total {total:.2f}s")
        # sigs-write time = epoch total minus the timed sub-stages
        sub = sum(v for k2, v in TIMES.items() if k2 not in ("E_epoch_total",))
        for k2 in sorted(TIMES):
            print(f"  {k2:22s} {TIMES[k2]:7.2f}s  {JOBS.get(k2,0):3d} jobs")
        est = TIMES["E_epoch_total"] - sum(
            TIMES.get(x, 0.0)
            for x in ("3_pairs_fused_join", "5_kept_driver_write", "6_bm25_extend", "6_bm25_write0")
        )
        print(f"  {'4_sigs_write_est':22s} {est:7.2f}s")
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
