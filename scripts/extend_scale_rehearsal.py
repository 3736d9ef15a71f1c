"""Extend-lifecycle scale rehearsal: the O(batch) claim, measured.

The r9 lifecycle work claims extension is O(batch), never O(corpus):
``ArtifactStore.commit_extension`` hard-links the standing files and
the per-kind extenders append only the ingest delta. This script puts
numbers on that at a rehearsal scale — standing corpus = 95% of the
docs/vectors, ingest batch = the 5% slice split into an extend half
and a probe half — and reports build / extend / probe / compact
wall-clock per artifact kind as one JSON line.

Usage: python scripts/extend_scale_rehearsal.py [sf_dir]
       (default /root/repo/.scaledata/sf10; sf0.1 works for a smoke)
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

from opencypher_datalayer_spark.operators.artifacts import ArtifactStore  # noqa: E402
from opencypher_datalayer_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf10"
    spark = get_spark(app_name="extend_rehearsal")
    root = tempfile.mkdtemp(prefix="extend_rehearsal_")
    store = ArtifactStore(root)
    out: dict = {"sf_dir": sf_dir, "kinds": {}}

    from opencypher_datalayer_spark.benchqueries.dedup import _shingle_hashes
    from opencypher_datalayer_spark.operators.ngram_corpus import (
        compact_ngram_corpus,
        extend_ngram_corpus,
        probe_near_dups,
        write_ngram_corpus,
    )

    def timed(fn):
        t0 = time.monotonic()
        r = fn()
        return r, round(time.monotonic() - t0, 2)

    # ---- ngram corpus ---------------------------------------------------
    sh = _shingle_hashes(spark, sf_dir, "xxhash64")
    corpus = sh.where(F.col("doc_id") % 20 != 0)
    b_ext = sh.where(F.col("doc_id") % 40 == 0)  # extend half of the 5%
    b_probe = sh.where((F.col("doc_id") % 20 == 0) & (F.col("doc_id") % 40 != 0))
    k = ("ngram_corpus", ("r",))
    _, t_build = timed(
        lambda: store.get_or_build(*k, lambda d: write_ngram_corpus(spark, corpus, d))
    )
    v2, t_ext = timed(lambda: extend_ngram_corpus(spark, store, *k, b_ext))
    pairs, t_probe = timed(
        lambda: probe_near_dups(spark, v2, b_probe, 0.8).count()
    )
    _, t_comp = timed(lambda: compact_ngram_corpus(spark, store, *k))
    out["kinds"]["ngram_corpus"] = {
        "build": t_build, "extend": t_ext, "probe_after_extend": t_probe,
        "compact": t_comp, "probe_pairs": pairs,
    }
    print("ngram:", out["kinds"]["ngram_corpus"], flush=True)
    store.sweep(keep_versions=1)

    # ---- minhash sigs ---------------------------------------------------
    from opencypher_datalayer_spark.operators.minhash_corpus import (
        extend_minhash_sigs,
        write_minhash_sigs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    dc = docs.where(F.col("doc_id") % 20 != 0)
    db = docs.where(F.col("doc_id") % 20 == 0)
    k = ("minhash_sigs", ("r",))
    _, t_build = timed(
        lambda: store.get_or_build(*k, lambda d: write_minhash_sigs(dc, d, "xxhash64"))
    )
    _, t_ext = timed(lambda: extend_minhash_sigs(spark, store, *k, db, "xxhash64"))
    out["kinds"]["minhash_sigs"] = {"build": t_build, "extend": t_ext}
    print("minhash:", out["kinds"]["minhash_sigs"], flush=True)

    # ---- IVF index --------------------------------------------------------
    from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec
    from opencypher_datalayer_spark.operators.vector_index import (
        build_ivf_index,
        compact_ivf_index,
        extend_ivf_index,
        ivf_pruned_topk,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ec = emb.where(F.col("vec_id") % 20 != 0)
    eb = emb.where(F.col("vec_id") % 20 == 0)
    k = ("ivf", ("r",))
    _, t_build = timed(
        lambda: store.get_or_build(*k, lambda d: build_ivf_index(spark, ec, d))
    )
    vi, t_ext = timed(lambda: extend_ivf_index(spark, store, *k, eb))
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), _vec().alias("qv"), _norm(_vec()).alias("qn")
    )
    n, t_probe = timed(lambda: ivf_pruned_topk(spark, vi, queries, topk=5).count())
    _, t_comp = timed(lambda: compact_ivf_index(spark, store, *k))
    out["kinds"]["ivf"] = {
        "build": t_build, "extend": t_ext, "probe_after_extend": t_probe,
        "compact": t_comp, "topk_rows": n,
    }
    print("ivf:", out["kinds"]["ivf"], flush=True)

    # ---- BM25 inverted index (r10) ---------------------------------------
    from opencypher_datalayer_spark.operators.bm25_index import (
        bm25_scores,
        compact_bm25_index,
        extend_bm25_index,
        write_bm25_index,
    )
    from opencypher_datalayer_spark.operators.textkit import tokens

    k = ("bm25_index", ("r",))
    _, t_build = timed(
        lambda: store.get_or_build(*k, lambda d: write_bm25_index(dc, d))
    )
    vb, t_ext = timed(lambda: extend_bm25_index(spark, store, *k, db))
    qdf = (
        docs.orderBy("doc_id")
        .limit(5)
        .select(F.col("doc_id").alias("q_id"), tokens(F.col("text")).alias("toks"))
    )
    n, t_probe = timed(lambda: bm25_scores(spark, vb, qdf).count())
    _, t_comp = timed(lambda: compact_bm25_index(spark, store, *k))
    out["kinds"]["bm25_index"] = {
        "build": t_build, "extend": t_ext, "probe_after_extend": t_probe,
        "compact": t_comp, "scored_rows": n,
    }
    print("bm25:", out["kinds"]["bm25_index"], flush=True)

    print(json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
