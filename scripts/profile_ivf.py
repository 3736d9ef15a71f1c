"""Phase-level profile of sim_ivf_pruned_topk at sf0.1 (dev tool).

Times each stage of the build+probe pipeline separately so perf work
targets the real cost, not a guess. Run: python scripts/profile_ivf.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opencypher_datalayer_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_ivf")
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
    from opencypher_datalayer_spark.benchqueries.similarity import (
        N_QUERY,
        TOPK,
        _norm,
        _vec,
        load_table,
        rebalance_for_inflation,
        WORK_VEC_SCAN,
    )
    from opencypher_datalayer_spark.operators import ivf_codebook as cb
    from opencypher_datalayer_spark.operators.vector_index import (
        build_ivf_index,
        ivf_pruned_topk,
    )

    # warm
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    for rep in range(3):
        clear_memo_caches()
        t = {}
        t0 = time.perf_counter()

        emb = rebalance_for_inflation(
            load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN
        ).select("vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm"))
        n = emb.count()
        t["count"] = time.perf_counter() - t0

        t1 = time.perf_counter()
        vq_df = emb.select("vec_id", cb.vq_expr().alias("vq"))
        s = cb.train_stride(n)
        if s > 1:
            vq_df = vq_df.where(F.col("vec_id") % s == 0)
        ids, cq = cb.train_ivf(vq_df, n)
        t["train"] = time.perf_counter() - t1

        d = tempfile.mkdtemp(prefix="ivf_prof_")
        raw = rebalance_for_inflation(
            load_table(spark, "embeddings", sf_dir), work_per_row=WORK_VEC_SCAN
        )
        t1 = time.perf_counter()
        build_ivf_index(spark, raw, d, codebook=(n, ids, cq))
        t["build_write"] = time.perf_counter() - t1

        queries = emb.where(F.col("vec_id") < N_QUERY).select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        t1 = time.perf_counter()
        out = ivf_pruned_topk(spark, d, queries, topk=TOPK, nprobe=cb.ivf_nprobe(n))
        t["plan"] = time.perf_counter() - t1
        t1 = time.perf_counter()
        out.count()
        t["probe_exec"] = time.perf_counter() - t1
        t["total"] = time.perf_counter() - t0
        print({k: round(v, 3) for k, v in t.items()}, flush=True)
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
