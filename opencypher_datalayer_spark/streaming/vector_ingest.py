"""Streaming embedding ingest with ANN near-dup gating — the vector
modality's twin of the text-side streaming filter
(``streaming/neardup.py``): each arriving micro-batch of embeddings is
near-dup-checked against the STANDING IVF index, collapsed within
itself, and only the survivors extend the index (a new committed
artifact version per epoch — ``operators.vector_index`` lifecycle).
The reference layer has no analog (it delegates all execution to
Neo4j, ``layer.go:257-265``); this completes the modality x deployment
matrix: text and embeddings each have a batch corpus-wide dedup AND a
streaming ingest-time filter.

Semantics (deterministic given the frozen codebook):

1. **Bootstrap (first non-empty batch)** — a codebook is trained on
   the batch (``ivf_codebook.train_ivf``, the same exact-integer
   arithmetic as everywhere else), the batch is collapsed within
   itself, and the survivors become index version 1. The codebook is
   FROZEN from then on — extensions assign with it (FAISS ``add()``
   semantics); ``compact_ivf_index`` is the offline retrain.
2. **Corpus filter** — a batch vector is dropped when ANY standing
   vector sharing one of its ``ASSIGN_A`` assigned cells has cosine
   >= ``dup_cos`` (rounded to 6 places, the family-wide emit
   precision). Candidates come from a cell equi-join against the
   partition-pruned scan of ONLY the batch's assigned cells — the
   standing corpus is probed, never self-joined or shuffled.
3. **Within-batch collapse** — the same shared-cell + cosine relation
   among the remaining batch vectors forms a graph; each connected
   component keeps its minimum ``vec_id``
   (``operators.components``, the text filter's rule).
4. Survivors extend the index; ``meta.json`` records the epoch.

Detection is ANN-semantics by design: a pair is a dup when it is
DISCOVERED via a shared assigned cell and scores above threshold —
the 6-way boundary replication is the recall mechanism, exactly as in
the batch ``sim_*`` family (measured there; same codebook machinery).

Exactly-once under foreachBatch retries: the epoch marker lives INSIDE
``meta.json`` of the committed version, written atomically with the
epoch's vectors (``extend_ivf_index(meta_extra=...)``). A replayed
epoch sees ``last_epoch >= epoch_id`` on the CURRENT version and
no-ops; a crash before the commit left no version, so the retry is the
first attempt. ``compact_ivf_index`` carries the marker over, so
compacting mid-stream never reopens the replay window. The sink is the
single writer (``ArtifactStore.commit_extension``'s contract).

Scale shape: per epoch, one Arrow-batched assignment of the batch
(codebook in the UDF closure — no shuffle), one cell equi-join with
the per-doc-bounded batch side broadcast under a byte gate, one
batch-internal component solve, one appended-delta commit. Nothing is
ever corpus x corpus; the standing side moves only through pruned
parquet scans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencypher_datalayer_spark.functions.localframe import local_df
from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.components import (
    connected_components,
    driver_edge_budget,
)
from opencypher_datalayer_spark.operators.ivf_codebook import (
    ASSIGN_A,
    assign_cells,
    train_ivf,
    train_stride,
    vq_expr,
)
from opencypher_datalayer_spark.operators.ivf_codebook import k_cells_for
from opencypher_datalayer_spark.operators.scale import rebalance_rows
from opencypher_datalayer_spark.operators.vector_index import (
    _write_ivf_vnrm,
    extend_ivf_index,
    index_meta,
    needs_compact,
    read_codebook,
)

# Same operating point as the batch embedding near-dup family
# (benchqueries.similarity.DUP_COS — the synthetic corpus tops out
# near 0.6 cosine, so 0.55 is its "same document" threshold).
DUP_COS = 0.55

# The broadcast side is the batch's assignment explode: ASSIGN_A rows
# per vector x (id + cell + v/nrm doubles) ~ 6 x 300 B. Above the gate
# (a replayed mega-batch) the hint is withheld and AQE picks the join.
BATCH_BROADCAST_BYTES_PER_VEC = 6 * 300
BATCH_BROADCAST_MAX_BYTES = 512 << 20

# Driver-count shape gates (the text filter's dedup_batch_against
# idiom): dup/drop decisions for a micro-batch are collected to the
# driver and the survivor COUNT becomes arithmetic — no survivor
# checkpoint, no count job, extend_ivf_index told its exact delta.
# A replayed mega-batch (ids over the cap, or a pair list past the
# union-find budget) falls back to the distributed frame shape.
VEC_DRIVER_IDS_MAX = 5_000_000
VEC_PAIR_COLLECT_BUDGET = 2_000_000


def _cos(av, an, bv, bn) -> F.Column:
    dot = F.aggregate(
        F.zip_with(av, bv, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.round(dot / (an * bn), 6)


# -- vectorized pair scoring for production dims ------------------------
#
# The emit rule everywhere in this family is round(fold_cos, 6) >= t,
# where fold_cos left-folds the float64 dot (F.aggregate — the exact
# arithmetic the DuckDB oracles recompute). Spark evaluates that
# higher-order lambda INTERPRETED, per candidate pair: fine at d=32,
# but at a production dimension (256-768) the per-pair cost is 8-24x
# and the shared-cell candidate volume makes the join-then-fold shape
# the whole epoch's runtime (measured at the d=256 rehearsal: the
# bootstrap collapse alone ran minutes). Above VEC_KERNEL_MIN_DIM the
# two dup-detection sites instead score per CELL with an Arrow-batched
# blocked numpy matmul — rows move once (cell group -> Arrow), never
# per pair — and keep the decision BIT-IDENTICAL by a margin rescue:
# |np_cos - fold_cos| <= dim * eps <= ~6e-14 (both divide by the SAME
# fold-computed norm columns, so only the dot's summation order
# differs), so any pair whose half-up-rounded cosine is decided by
# more than _COS_MARGIN on either side of t classifies identically;
# the (empirically zero) pairs inside the margin are re-scored with
# the exact python left fold inside the UDF. Differential tests pin
# kernel == fold-join on planted boundary-heavy corpora.
VEC_KERNEL_MIN_DIM = 64
_COS_MARGIN = 1e-9
_PAIR_BLOCK = 2048


def _round6(x):
    import numpy as np

    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def _fold_cos_py(a, b, an, bn) -> float:
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return round(s / (an * bn), 6)


def _dup_hits_vs_standing(batch_assign: DataFrame, standing: DataFrame, t: float) -> DataFrame:
    """``vec_id`` rows of batch vectors having ANY standing vector with
    emit-cosine >= ``t`` in a shared cell — the corpus filter, scored
    cell-cogrouped with the blocked matmul + margin rescue."""
    import numpy as np
    import pandas as pd

    thr = float(t)

    def fn(_key, bdf: pd.DataFrame, sdf: pd.DataFrame):
        if not len(bdf) or not len(sdf):
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64")})
        B = np.stack(bdf["v"].to_numpy()).astype(np.float64)
        bn = bdf["nrm"].to_numpy(dtype=np.float64)
        S = np.stack(sdf["v"].to_numpy()).astype(np.float64)
        sn = sdf["nrm"].to_numpy(dtype=np.float64)
        hit = np.zeros(len(B), dtype=bool)
        for i0 in range(0, len(B), _PAIR_BLOCK):
            i1 = min(i0 + _PAIR_BLOCK, len(B))
            live = np.flatnonzero(~hit[i0:i1]) + i0
            if not len(live):
                continue
            for j0 in range(0, len(S), _PAIR_BLOCK):
                j1 = min(j0 + _PAIR_BLOCK, len(S))
                cos = (B[live] @ S[j0:j1].T) / np.outer(bn[live], sn[j0:j1])
                sure = _round6(cos - _COS_MARGIN) >= thr
                hit[live[sure.any(axis=1)]] = True
                border = (~sure) & (_round6(cos + _COS_MARGIN) >= thr)
                for bi, sj in zip(*np.nonzero(border)):
                    gi = live[bi]
                    if not hit[gi] and (
                        _fold_cos_py(B[gi], S[j0 + sj], bn[gi], sn[j0 + sj]) >= thr
                    ):
                        hit[gi] = True
                live = live[~hit[live]]
                if not len(live):
                    break
        return pd.DataFrame({"vec_id": bdf["vec_id"].to_numpy()[hit]})

    # the index's hive partition column reads back as INT while the
    # assignment side carries BIGINT; a join would coerce, but cogroup
    # matches raw grouping keys — mismatched types silently pair
    # nothing (found by the d=256 A/B differential), so pin both long
    left = batch_assign.select(
        "vec_id", F.col("cell").cast("long").alias("cell"), "v", "nrm"
    )
    right = standing.select(F.col("cell").cast("long").alias("cell"), "v", "nrm")
    return (
        left.groupBy("cell")
        .cogroup(right.groupBy("cell"))
        .applyInPandas(fn, "vec_id long")
        .dropDuplicates()
    )


def _dup_pairs_within(assign: DataFrame, t: float) -> DataFrame:
    """Distinct ``(doc_a, doc_b)`` (ordered by vec_id) pairs of batch
    vectors with emit-cosine >= ``t`` sharing a cell — the within-batch
    relation, scored per cell group with the blocked matmul."""
    import numpy as np
    import pandas as pd

    thr = float(t)

    def fn(pdf: pd.DataFrame):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nr = pdf["nrm"].to_numpy(dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        out_a, out_b = [], []
        for i0 in range(0, n, _PAIR_BLOCK):
            i1 = min(i0 + _PAIR_BLOCK, n)
            for j0 in range(i0, n, _PAIR_BLOCK):
                j1 = min(j0 + _PAIR_BLOCK, n)
                cos = (V[i0:i1] @ V[j0:j1].T) / np.outer(nr[i0:i1], nr[j0:j1])
                qual = _round6(cos - _COS_MARGIN) >= thr
                border = (~qual) & (_round6(cos + _COS_MARGIN) >= thr)
                for bi, bj in zip(*np.nonzero(border)):
                    gi, gj = i0 + bi, j0 + bj
                    if ids[gi] != ids[gj] and (
                        _fold_cos_py(V[gi], V[gj], nr[gi], nr[gj]) >= thr
                    ):
                        qual[bi, bj] = True
                qi, qj = np.nonzero(qual)
                gi, gj = qi + i0, qj + j0
                keep = ids[gi] != ids[gj]
                gi, gj = gi[keep], gj[keep]
                lo = np.minimum(ids[gi], ids[gj])
                hi = np.maximum(ids[gi], ids[gj])
                out_a.append(lo)
                out_b.append(hi)
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        )

    return (
        assign.select("vec_id", "cell", "v", "nrm")
        .groupBy("cell")
        .applyInPandas(fn, "doc_a long, doc_b long")
        .dropDuplicates()
    )


class StreamingVectorIngest:
    """``foreachBatch`` sink maintaining a standing, dedup-gated IVF
    index (see module docstring). Usage::

        sink = StreamingVectorIngest(store, kind="ivf_stream", key=("corpus",))
        stream.writeStream.foreachBatch(sink.apply).start()

    Batch frames must carry ``vec_id`` and ``embedding array<float>``;
    any other column rides into the index as payload (filtered-probe
    ready). ``accepted_ids`` / ``index_dir`` expose the state.
    """

    def __init__(
        self,
        store: ArtifactStore,
        kind: str = "ivf_stream",
        key: tuple = ("corpus",),
        dup_cos: float = DUP_COS,
    ):
        self.store = store
        self.kind = kind
        self.key = key
        self.dup_cos = float(dup_cos)
        # advisory drift signal of the LAST committed epoch
        # (vector_index.needs_compact — growth of the corpus past the
        # size the frozen codebook was trained on); a deployment polls
        # this to schedule the offline compact_ivf_index retrain
        # instead of discovering the drift in its recall metrics
        self.last_compact_signal: dict | None = None

    # -- state ----------------------------------------------------------

    def index_dir(self) -> str | None:
        return self.store.current_dir(self.kind, self.key)

    def compact_signal(self, spark: SparkSession) -> dict | None:
        """``vector_index.needs_compact`` of the CURRENT index version
        (None before bootstrap). Also refreshed automatically after
        every committed epoch into ``last_compact_signal``."""
        cur = self.index_dir()
        return None if cur is None else needs_compact(spark, cur)

    def accepted_ids(self, spark: SparkSession) -> DataFrame:
        """Distinct accepted ``vec_id``s (empty frame before bootstrap)."""
        cur = self.index_dir()
        if cur is None:
            return spark.createDataFrame([], "vec_id long")
        return (
            spark.read.parquet(os.path.join(cur, "vectors"))
            .select("vec_id")
            .dropDuplicates()
        )

    # -- the sink ---------------------------------------------------------

    def apply(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = self.index_dir()
        if cur is not None and int(index_meta(cur).get("last_epoch", -1)) >= int(
            epoch_id
        ):
            return  # foreachBatch replay of a committed epoch: no-op

        from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec

        extras = [c for c in batch_df.columns if c not in ("vec_id", "embedding")]
        emb = batch_df.select(
            "vec_id", *extras, _vec().alias("v"), _norm(_vec()).alias("nrm")
        ).localCheckpoint()
        nb = emb.count()

        if cur is None:
            if nb == 0:
                return  # nothing to bootstrap from; no state to mark
            self._bootstrap(spark, emb, extras, nb, epoch_id)
            return

        ids, cq = read_codebook(spark, cur)
        # a file-source micro-batch arrives as ~ONE partition and the
        # Arrow-batched scorer would run the whole batch on one core —
        # the text filter's measured single-file trap (SCALE.md
        # §stream-rehearsal); per-row work here is K cells x dim flops
        emb_b = rebalance_rows(emb, nb, work_per_row=len(ids) * 32)
        assign = assign_cells(
            emb_b.withColumn("vq", vq_expr()), ids, cq, ASSIGN_A
        ).localCheckpoint()
        # batch vectors must share the codebook's dimension (assignment
        # requires it), so the kernel decision reads the centroid shape
        # instead of paying a first() job on the batch every epoch
        use_kernel = len(ids) > 0 and cq.shape[1] >= VEC_KERNEL_MIN_DIM

        # corpus filter: pruned scan of ONLY the batch's assigned cells
        admitted = sorted(
            r.cell for r in assign.select("cell").dropDuplicates().collect()
        )  # bounded by the trained cell count
        standing = (
            spark.read.parquet(os.path.join(cur, "vectors"))
            .where(F.col("cell").isin(admitted))
            .select("cell", "v", "nrm")
        )
        batch_slim = assign.select("vec_id", "cell", "v", "nrm")
        if use_kernel:
            # production dims: blocked-matmul cogroup — rows shuffle by
            # cell ONCE (never per pair), decisions bit-identical to the
            # fold join via the margin rescue (see kernel docstring)
            dup_of_corpus = _dup_hits_vs_standing(batch_slim, standing, self.dup_cos)
        else:
            hint = (
                F.broadcast
                if nb * BATCH_BROADCAST_BYTES_PER_VEC <= BATCH_BROADCAST_MAX_BYTES
                else (lambda df: df)
            )
            dup_of_corpus = (
                hint(batch_slim)
                .join(
                    standing.select(
                        "cell", F.col("v").alias("sv"), F.col("nrm").alias("sn")
                    ),
                    "cell",
                )
                .where(
                    _cos(F.col("v"), F.col("nrm"), F.col("sv"), F.col("sn"))
                    >= self.dup_cos
                )
                .select("vec_id")
                .dropDuplicates()
            )
        if nb <= VEC_DRIVER_IDS_MAX:
            # driver-count shape: the corpus-dup id set is bounded by
            # the batch, so collect it; the within-batch collapse then
            # runs over (checkpointed assign − broadcast id list) and,
            # when the pair list fits the union-find budget, the
            # dropped set and the survivor count are driver arithmetic
            # — no survivor checkpoint, no count job in the extension
            dup_ids = {int(r.vec_id) for r in dup_of_corpus.collect()}
            surv = assign
            if dup_ids:
                surv = assign.join(
                    F.broadcast(
                        local_df(spark, [(d,) for d in sorted(dup_ids)], "vec_id long")
                    ),
                    "vec_id",
                    "left_anti",
                )
            within = self._within_dropped_driver(surv, use_kernel)
            if within is not None:
                dropped = sorted(dup_ids | set(within))
                accepted = batch_df
                if dropped:
                    accepted = batch_df.join(
                        F.broadcast(
                            local_df(spark, [(d,) for d in dropped], "vec_id long")
                        ),
                        "vec_id",
                        "left_anti",
                    )
                new_cur = extend_ivf_index(
                    spark,
                    self.store,
                    self.kind,
                    self.key,
                    accepted,
                    meta_extra={"last_epoch": int(epoch_id)},
                    n_rows=nb - len(dropped),
                )
                self.last_compact_signal = needs_compact(spark, new_cur)
                return

        # distributed fallback (a replayed mega-batch): frames, not
        # driver lists — the original shape, checkpointed and counted
        surv = assign.join(dup_of_corpus, "vec_id", "left_anti").localCheckpoint()
        keep_ids = self._collapse_within(surv, use_kernel)
        accepted = batch_df.join(keep_ids, "vec_id")
        new_cur = extend_ivf_index(
            spark,
            self.store,
            self.kind,
            self.key,
            accepted,
            meta_extra={"last_epoch": int(epoch_id)},
        )
        self.last_compact_signal = needs_compact(spark, new_cur)

    # -- internals --------------------------------------------------------

    @staticmethod
    def _use_kernel(emb: DataFrame) -> bool:
        """True when the batch's dimension warrants the blocked-matmul
        scoring kernel (one bounded first() on the checkpointed frame)."""
        row = emb.select("v").first()
        return row is not None and len(row["v"]) >= VEC_KERNEL_MIN_DIM

    def _bootstrap(self, spark, emb, extras, nb, epoch_id) -> None:
        """Train on the first batch, collapse it within itself, commit
        survivors as version 1 with the frozen codebook."""
        import json

        emb = rebalance_rows(emb, nb, work_per_row=k_cells_for(nb) * 32)
        s = train_stride(nb)
        vq_df = emb.select("vec_id", vq_expr().alias("vq"))
        if s > 1:
            vq_df = vq_df.where(F.col("vec_id") % s == 0)
        ids, cq = train_ivf(vq_df, nb)
        assign = assign_cells(
            emb.withColumn("vq", vq_expr()), ids, cq, ASSIGN_A
        ).localCheckpoint()
        use_kernel = len(ids) > 0 and cq.shape[1] >= VEC_KERNEL_MIN_DIM
        dropped = (
            self._within_dropped_driver(assign, use_kernel)
            if nb <= VEC_DRIVER_IDS_MAX
            else None
        )
        if dropped is not None:
            # driver-count shape (see apply): survivor count is
            # arithmetic; the checkpoint stays because _write_ivf_vnrm
            # consumes the frame twice (scales aggregate + write)
            survivors = emb
            if dropped:
                survivors = emb.join(
                    F.broadcast(
                        local_df(spark, [(d,) for d in dropped], "vec_id long")
                    ),
                    "vec_id",
                    "left_anti",
                )
            survivors = survivors.localCheckpoint()
            n_keep = nb - len(dropped)
        else:
            keep_ids = self._collapse_within(assign, use_kernel)
            survivors = emb.join(keep_ids, "vec_id").localCheckpoint()
            n_keep = survivors.count()

        def build(tmp: str) -> None:
            _write_ivf_vnrm(spark, survivors, tmp, codebook=(nb, ids, cq))
            with open(os.path.join(tmp, "meta.json"), "w") as f:
                # n_trained = the batch the codebook saw (k_cells_for's
                # input), the denominator of needs_compact's growth
                json.dump(
                    {
                        "n_corpus": int(n_keep),
                        "n_trained": int(nb),
                        "last_epoch": int(epoch_id),
                    },
                    f,
                )

        new_cur = self.store.commit(self.kind, self.key, build)
        self.last_compact_signal = needs_compact(spark, new_cur)

    def _within_edges(self, assign: DataFrame, use_kernel: bool) -> DataFrame:
        """Distinct within-batch near-dup ``(doc_a, doc_b)`` pairs of an
        assignment frame — shared by the driver-count and frame paths."""
        if use_kernel:
            return _dup_pairs_within(assign, self.dup_cos)
        a = assign.select(
            F.col("vec_id").alias("doc_a"),
            "cell",
            F.col("v").alias("av"),
            F.col("nrm").alias("an"),
        )
        b = assign.select(
            F.col("vec_id").alias("doc_b"),
            "cell",
            F.col("v").alias("bv"),
            F.col("nrm").alias("bn"),
        )
        return (
            a.join(b, "cell")
            .where(F.col("doc_a") < F.col("doc_b"))
            .where(
                _cos(F.col("av"), F.col("an"), F.col("bv"), F.col("bn"))
                >= self.dup_cos
            )
            .select("doc_a", "doc_b")
            .dropDuplicates()
        )

    def _within_dropped_driver(
        self, assign: DataFrame, use_kernel: bool
    ) -> list[int] | None:
        """Dropped ``vec_id``s of the within-batch collapse, decided on
        the driver (one limited Arrow pull + union-find — the text
        filter's ``dedup_batch_against`` idiom): each component keeps
        its minimum id, everything else drops. Returns ``None`` when
        the pair list exceeds the driver budget (mega-batch fallback
        signal)."""
        from opencypher_datalayer_spark.streaming.neardup import _union_find_min

        budget = min(driver_edge_budget(), VEC_PAIR_COLLECT_BUDGET)
        pdf = self._within_edges(assign, use_kernel).limit(budget + 1).toPandas()
        if len(pdf) > budget:
            return None
        labels = _union_find_min(
            list(zip(pdf["doc_a"].tolist(), pdf["doc_b"].tolist()))
        )
        return sorted(int(x) for x, mn in labels.items() if mn < x)

    def _collapse_within(self, assign: DataFrame, use_kernel: bool = False) -> DataFrame:
        """Keep set of a batch assignment frame: shared-cell + cosine
        edges -> connected components -> component minimum survives.
        Returns a ``vec_id`` frame."""
        edges = self._within_edges(assign, use_kernel)
        labels = connected_components(edges, src="doc_a", dst="doc_b")
        dropped = labels.where(F.col("comp") != F.col("id")).select(
            F.col("id").alias("vec_id")
        )
        return (
            assign.select("vec_id")
            .dropDuplicates()
            .join(dropped, "vec_id", "left_anti")
        )
