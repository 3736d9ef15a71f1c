"""SQ8 coded-index rehearsal at a PRODUCTION dimension (VERDICT r11
next #5): the r11 scan-bytes A/B ran at the bench corpus's d=32..64,
where the int8-vs-float byte ratio floors near 6x and stage-1 CPU is
cheap. This rehearses the full coded path on the planted-family d=256
corpus (``scripts/gen_scale.py --vectors-only``):

1. standing-index BUILD (train + assign + coded cell write) wall time;
2. footer-exact scan-bytes ratio, whole index and one probe's admitted
   cells (expect ~8x at d=256 — the code column is 1 byte/dim vs the
   8-byte/dim raw doubles);
3. two-stage probe wall time (min of 3) split into stage-1 coded scan
   + stage-2 rerank, vs the inline float probe's full-vector scan;
4. recall@5 of the coded probe against an exact numpy brute-force
   oracle at the committed nprobe step;
5. one O(batch) EXTENSION + a re-probe (frozen-quantizer path at d=256).

Usage: python scripts/ivf_sq8_d256_rehearsal.py [d256_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opencypher_datalayer_spark.session import get_spark  # noqa: E402
from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec  # noqa: E402
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore  # noqa: E402
from opencypher_datalayer_spark.operators.ivf_codebook import ivf_nprobe  # noqa: E402
from opencypher_datalayer_spark.operators.vector_index import (  # noqa: E402
    build_ivf_index,
    extend_ivf_index,
    ivf_pruned_topk,
)

try:  # reuse the footer walker
    from sq8_scan_bytes_ab import column_bytes
except ImportError:  # pragma: no cover - direct invocation path
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from sq8_scan_bytes_ab import column_bytes

TOPK = 5
N_Q = 100


def main() -> None:
    d_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/d256"
    spark = get_spark(app_name="d256_sq8")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(d_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    n = emb.count()
    # hold the last 5k ids out as the extension batch
    base = emb.where(F.col("vec_id") < n - 5000)
    batch = emb.where(F.col("vec_id") >= n - 5000)

    # fixed root: re-runs reuse the standing index (get_or_build)
    store = ArtifactStore(os.path.join(tempfile.gettempdir(), "d256_sq8_store"))
    t0 = time.time()
    store.get_or_build("ivf", ("d256",), lambda d: build_ivf_index(spark, base, d))
    t_build = time.time() - t0
    adir = store.current_dir("ivf", ("d256",))
    out = {"d_dir": d_dir, "n": int(n), "build_s": round(t_build, 1)}

    # -- scan bytes (footer-exact) --------------------------------------
    vroot = os.path.join(adir, "vectors")
    cb = column_bytes(vroot)
    code = cb["code"]["compressed"]
    raw = cb["v"]["compressed"] + cb["nrm"]["compressed"]
    out["scan_bytes"] = {
        "code": code,
        "raw": raw,
        "raw_over_code": round(raw / code, 2),
    }

    # -- probe timing + recall ------------------------------------------
    qdf = (
        base.where(F.col("vec_id") < N_Q)
        .select(
            F.col("vec_id").alias("q_id"),
            _vec("embedding").alias("qv"),
            _norm(_vec("embedding")).alias("qn"),
        )
        .localCheckpoint()
    )
    nprobe = ivf_nprobe(int(base.count()))
    times = []
    for _ in range(3):
        t0 = time.time()
        rows = ivf_pruned_topk(spark, adir, qdf, topk=TOPK, nprobe=nprobe).collect()
        times.append(time.time() - t0)
    out["probe_s_min3"] = round(min(times), 2)
    out["nprobe"] = nprobe
    got = {}
    for r in rows:
        got.setdefault(r.q_id, set()).add(r.c_id)

    # exact oracle: numpy brute force over the base corpus
    pdf = base.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nr = np.sqrt((M * M).sum(1))
    qmask = ids < N_Q
    Q = M[qmask]
    qn = nr[qmask]
    qids = ids[qmask]
    # recall split by TIER: the committed thresholds serve the
    # FAMILY tier (planted neighbors at cos >= DUP_COS=0.55 — what the
    # dedup/stream operating points are calibrated for); the NOISE
    # tier (exact top-5 of independent Gaussians, gaps ~0.005 at
    # cos~0.25) is the adversarial bound no quantized stage can order
    # cheaply — SCALE.md §ivf-sq8-d256 records the measured widening
    # rule (nprobe ~344 for admission 0.938; coded rerank ~5000, at
    # which point the float probe in admitted cells wins).
    hits = tot = fhits = ftot = 0
    for qi in range(len(qids)):
        cos = (M @ Q[qi]) / (nr * qn[qi])
        cos[ids == qids[qi]] = -2.0
        order = np.lexsort((ids, -np.round(cos, 6)))[:TOPK]
        want = set(ids[order])
        mine = got.get(int(qids[qi]), set())
        hits += len(want & mine)
        tot += TOPK
        fam = set(ids[cos >= 0.55])
        if fam:
            fhits += len(fam & mine)
            ftot += len(fam)
    out["recall_at_5_mixed"] = round(hits / tot, 4)
    out["recall_family_tier"] = round(fhits / ftot, 4) if ftot else None
    out["family_truth_pairs"] = int(ftot)

    # -- extension + re-probe --------------------------------------------
    t0 = time.time()
    extend_ivf_index(spark, store, "ivf", ("d256",), batch)
    out["extend_s"] = round(time.time() - t0, 1)
    adir2 = store.current_dir("ivf", ("d256",))
    t0 = time.time()
    n_rows = ivf_pruned_topk(spark, adir2, qdf, topk=TOPK, nprobe=nprobe).count()
    out["probe_after_extend_s"] = round(time.time() - t0, 2)
    out["probe_after_extend_rows"] = int(n_rows)

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
