"""Per-stage wall-clock decomposition of the st_stream_clean_ingest
epoch loop at sf0.1 (guide §1: measure first). Mirrors
benchqueries.curation.st_stream_clean_ingest but times each stage of
every epoch, plus the final probe."""

import hashlib
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.curation import (
    CLEAN_MIN_ALPHA,
    CLEAN_MIN_TOKENS,
)
from opencypher_datalayer_spark.benchqueries.dedup import (
    DEFAULT_HASH_FAMILY,
    STREAM_NBATCH,
    WORK_MINHASH,
    _docs_fingerprint,
)
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.scale import rebalance_for_inflation
from opencypher_datalayer_spark.session import get_spark
from opencypher_datalayer_spark.sources.tables import load_table
from opencypher_datalayer_spark.streaming.clean_ingest import StreamingCleanIngest

TIMES: dict[str, float] = {}


def clock(key):
    class _T:
        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *a):
            TIMES[key] = TIMES.get(key, 0.0) + time.perf_counter() - self.t0

    return _T()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_stream_clean")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    family = DEFAULT_HASH_FAMILY
    docs = rebalance_for_inflation(
        load_table(spark, "documents", sf_dir).select("doc_id", "text"),
        work_per_row=WORK_MINHASH,
    )
    digest = hashlib.md5(
        repr((_docs_fingerprint(sf_dir), family)).encode()
    ).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"prof_clean_{digest}_p{os.getpid()}")
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

    # instrument the sink's internals
    from opencypher_datalayer_spark.operators import bm25_index as bi
    from opencypher_datalayer_spark.operators.textkit import quality_floor
    from opencypher_datalayer_spark.operators.scale import rebalance_rows

    from opencypher_datalayer_spark.operators import minhash as mh
    from opencypher_datalayer_spark.streaming.neardup import dedup_batch_against

    def run_once():
        for k in range(STREAM_NBATCH):
            batch = docs.where(F.col("doc_id") % STREAM_NBATCH == k)
            cur = sink.store.current_dir(sink.kind, sink.key)
            clean = batch.where(quality_floor(sink.min_tokens, sink.min_alpha))
            # --- filter.apply, inlined with timers ---
            b = clean.select("doc_id", "text")
            with clock("1a_batch_count"):
                n = b.count()
            with clock("1b_signatures_ckpt"):
                sig = mh.signatures_for(
                    rebalance_rows(b, n, work_per_row=mh.SIGNATURE_WORK_PER_DOC),
                    sink.filter.hash_family,
                ).localCheckpoint()
            with clock("1c_sig_count"):
                n_sig = sig.count()
            with clock("1d_dedup_batch_against"):
                kept = dedup_batch_against(
                    sig,
                    sink.filter.corpus_sigs(before_epoch=k),
                    sink.filter.agree_r,
                    batch_rows=n_sig,
                )
            with clock("1e_kept_ckpt"):
                kept = kept.localCheckpoint()
            epoch_col = F.lit(int(k)).cast("long")
            with clock("1f_sigs_write"):
                (
                    kept.withColumn("epoch", epoch_col)
                    .write.mode("overwrite")
                    .partitionBy("epoch")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(sink.filter.sigs_dir)
                )
            with clock("1g_kept_write"):
                (
                    kept.select("doc_id")
                    .withColumn("batch", epoch_col)
                    .withColumn("epoch", epoch_col)
                    .write.mode("overwrite")
                    .partitionBy("epoch")
                    .option("partitionOverwriteMode", "dynamic")
                    .parquet(sink.filter.kept_dir)
                )
            with clock("2_kept_read+join+ckpt"):
                kept_now = (
                    sink.filter.kept().where(F.col("batch") == k).select("doc_id")
                )
                survivors = batch.join(kept_now, "doc_id", "left_semi").localCheckpoint()
            with clock("3_surv_count"):
                n_surv = survivors.count()
            with clock("4_rebalance+extend"):
                survivors = rebalance_rows(
                    survivors, n_surv, work_per_row=bi.WORK_TOKENIZE
                )
                marker = {"last_epoch": int(k)}
                if cur is None:
                    sink.store.commit(
                        sink.kind,
                        sink.key,
                        lambda tmp: bi.write_bm25_index(
                            survivors, tmp, meta_extra=marker
                        ),
                    )
                else:
                    bi.extend_bm25_index(
                        spark,
                        sink.store,
                        sink.kind,
                        sink.key,
                        survivors,
                        meta_extra=marker,
                        n_docs=n_surv,
                    )
            with clock("5_signal"):
                sink.last_compact_signal = sink.compact_signal()

    for rep in range(2):
        TIMES.clear()
        shutil.rmtree(root, ignore_errors=True)
        sink.store.__init__(os.path.join(root, "store"))
        sink.filter.__init__(spark, os.path.join(root, "state"), hash_family=family)
        t_all = time.perf_counter()
        run_once()
        TIMES["total_epochs"] = time.perf_counter() - t_all
        print(f"--- rep {rep} ---")
        for k, v in sorted(TIMES.items()):
            print(f"{k:28s} {v:7.3f}s")


if __name__ == "__main__":
    main()
