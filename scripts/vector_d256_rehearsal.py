"""Vector-stream + filtered-probe rehearsal at a PRODUCTION-LIKE
dimension (VERDICT r9 next #6): the d=32 synthetic corpus has zero
qualifying pairs at the family's documented DUP_COS=0.55 (SCALE.md
§vector-stream), so the r9 rehearsals demonstrated the rule at a demo
threshold inside the noise floor. This one runs over the planted-family
d=256 corpus (``scripts/gen_scale.py --vectors-only``), where 0.55
separates real structure from noise:

1. REAL file-source stream (maxFilesPerTrigger=1, availableNow) through
   ``StreamingVectorIngest`` at dup_cos=0.55 — acceptance per epoch,
   wall time, and the sink's compact-drift signal.
2. Metadata-FILTERED probe over the stream's standing index
   (``ivf_pruned_topk(match_cols=("label",))`` at the measured widened
   nprobe), recall@5 against an exact same-label numpy oracle.

Usage: python scripts/vector_d256_rehearsal.py [d256_dir] [n_epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from opencypher_datalayer_spark.session import get_spark  # noqa: E402
from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec  # noqa: E402
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore  # noqa: E402
from opencypher_datalayer_spark.operators.ivf_codebook import (  # noqa: E402
    ivf_filtered_nprobe,
)
from opencypher_datalayer_spark.operators.vector_index import (  # noqa: E402
    index_meta,
    ivf_pruned_topk,
)
from opencypher_datalayer_spark.streaming.vector_ingest import (  # noqa: E402
    DUP_COS,
    StreamingVectorIngest,
)

TOPK = 5
N_Q = 100


def main() -> None:
    d_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/d256"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="d256_rehearsal")
    emb = spark.read.parquet(os.path.join(d_dir, "embeddings.parquet"))
    n_total = emb.count()

    # -- 1. real stream at the documented operating point ---------------
    work = tempfile.mkdtemp(prefix="d256_stream_")
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals)
    for k in range(n_epochs):
        tmp = os.path.join(work, f"b{k}")
        emb.where(F.col("vec_id") % n_epochs == k).coalesce(1).write.parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(arrivals, f"batch{k}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_700_000_000 + 600 * k,) * 2)

    store = ArtifactStore(os.path.join(work, "store"))
    sink = StreamingVectorIngest(store, key=("d256",), dup_cos=DUP_COS)
    t0 = time.perf_counter()
    q = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
        .writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_s = time.perf_counter() - t0

    idx = sink.index_dir()
    accepted = sink.accepted_ids(spark)
    n_acc = accepted.count()
    per_epoch = {
        int(r.e): int(r.c)
        for r in accepted.groupBy((F.col("vec_id") % n_epochs).alias("e"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    print(
        json.dumps(
            {
                "phase": "stream",
                "dup_cos": DUP_COS,
                "n_in": n_total,
                "n_accepted": n_acc,
                "accept_rate": round(n_acc / n_total, 4),
                "per_epoch": per_epoch,
                "wall_s": round(stream_s, 1),
                "compact_signal": sink.last_compact_signal,
                "meta": index_meta(idx),
            }
        )
    )

    # -- 2. filtered probe over the stream's standing index -------------
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    nrm = np.linalg.norm(V, axis=1)
    labels = pdf["label"].to_numpy()
    acc_ids = np.array(sorted(r.vec_id for r in accepted.collect()))
    acc_mask = np.isin(ids, acc_ids)

    q_ids = sorted(int(i) for i in acc_ids[:N_Q])
    queries = emb.where(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"),
        _vec().alias("qv"),
        _norm(_vec()).alias("qn"),
        "label",
    ).localCheckpoint()

    # exact same-label oracle over the ACCEPTED corpus (engine emit
    # arithmetic: cosine rounded half-up to 6, self excluded, c_id ties)
    sub = np.flatnonzero(acc_mask)
    ids_s, V_s, nrm_s, lab_s = ids[sub], V[sub], nrm[sub], labels[sub]
    exact: dict[int, list[int]] = {}
    for qid in q_ids:
        qi = int(np.flatnonzero(ids_s == qid)[0])
        same = np.flatnonzero((lab_s == lab_s[qi]) & (ids_s != qid))
        cos = (V_s[same] @ V_s[qi]) / (nrm_s[same] * nrm_s[qi])
        cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
        order = sorted(zip(-cos, ids_s[same]))
        exact[qid] = [int(c) for _, c in order[:TOPK]]

    # sweep the widening: the committed FILTER_WIDEN_STEPS multipliers
    # were measured on the d=32 corpus — a dimension/geometry-specific
    # operating point, so the rehearsal re-derives the floor-restoring
    # multiplier here rather than trusting the transfer
    base = ivf_filtered_nprobe(n_acc)
    for npb in (base, 2 * base, 4 * base):
        t0 = time.perf_counter()
        got = ivf_pruned_topk(
            spark, idx, queries, topk=TOPK, nprobe=npb, match_cols=("label",)
        ).collect()
        probe_s = time.perf_counter() - t0
        by_q: dict[int, list[int]] = {}
        for r in got:
            by_q.setdefault(int(r.q_id), []).append(int(r.c_id))
        recalls = [
            len(set(by_q.get(q, [])) & set(top)) / TOPK for q, top in exact.items()
        ]
        print(
            json.dumps(
                {
                    "phase": "filtered_probe",
                    "nprobe": npb,
                    "probe_s": round(probe_s, 2),
                    "recall_mean": round(float(np.mean(recalls)), 4),
                    "recall_min": round(float(np.min(recalls)), 4),
                    "n_queries": len(q_ids),
                }
            )
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
