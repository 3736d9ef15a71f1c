"""Cell-partitioned IVF index (round-4 verdict #5): the probe scan must
be PARTITION-PRUNED — files in non-admitted cells are never opened — and
the two-stage SQ8 probe must match its own DuckDB oracle bit-for-bit
while holding a recall floor against the exact float probe."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.similarity import (
    sim_ivf_pruned_topk,
    sim_ivf_topk,
)
from opencypher_datalayer_spark.operators.vector_index import (
    build_ivf_index,
    ivf_pruned_topk,
)


def _mini_embeddings(spark, n_per_cell=6, dim=8):
    """4 well-separated clusters of one-hot-axis vectors (later members
    are the axis plus a small perturbation in a different axis). The r8
    trained codebook refines these into K=16 cells; ASSIGN_A-way
    boundary replication keeps each cluster's members reachable from
    the cluster's best cell, so a single-probe query on axis 0 still
    answers entirely from cluster 0 (verified for the committed
    IVF_K_MULT/ASSIGN_A operating point)."""
    rows = []
    for j in range(n_per_cell):
        for c in range(4):
            v = [0.0] * dim
            v[c] = 1.0
            if j > 0:
                v[4 + c] = 0.05 * j  # stays nearest to axis c
            rows.append((j * 4 + c, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _scan_num_files(df) -> int:
    """numFiles metric of the (single) parquet scan after an action."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" in node.getClass().getName():
            return int(node.metrics().apply("numFiles").value())
    raise AssertionError("no FileSourceScanExec leaf found")


def test_probe_scan_reads_only_admitted_cell_files(spark, tmp_path):
    emb = _mini_embeddings(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx)

    # the index has per-cell partition directories on disk (trained
    # codebook: K = min(n, max(8, IVF_K_MULT*isqrt(24))) = 24 on this
    # corpus — every vector seeds a cell when K exceeds the sample)
    all_files = spark.read.parquet(f"{idx}/vectors").inputFiles()
    n_cells = len({f.split("cell=")[1].split("/")[0] for f in all_files})
    assert n_cells == 24

    # the scan ivf_pruned_topk constructs (isin on the partition column)
    # opens ONLY the admitted cell's file — file-level pruning, not a
    # post-scan filter
    pruned_scan = spark.read.parquet(f"{idx}/vectors").where(F.col("cell").isin([0]))
    assert _scan_num_files(pruned_scan) < len(all_files)

    # full probe: one query on axis 0, nprobe=1 -> admitted={0}; the
    # executed plan's scan carries the partition filter
    queries = spark.createDataFrame(
        [(999, [1.0] + [0.0] * 7, 1.0)], "q_id long, qv array<double>, qn double"
    )
    out = ivf_pruned_topk(spark, idx, queries, nprobe=1, topk=3)
    rows = out.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    import re

    # the vectors scan (not the unpartitioned centroids scan) carries a
    # non-empty partition filter on cell
    blocks = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in b for b in blocks), blocks

    # admitted-cell scoring is exact: every hit comes from cluster 0
    assert len(rows) == 3
    assert rows[0].cosine > 0.99
    assert all(r.c_id % 4 == 0 for r in rows), rows  # cluster-0 ids are 0,4,8,...


def test_probe_coded_scan_prunes_raw_vectors(spark, tmp_path):
    """The SQ8 probe's stage-1 candidate scan reads ONLY (vec_id, cell,
    code) — parquet column pruning must skip the 8-byte/dim raw v/nrm
    columns (the ~8x scan-bytes win of the coded index) — and stage 2's
    rerank fetch carries a pushed-down In(vec_id) point lookup."""
    import re

    from opencypher_datalayer_spark.operators.vector_index import (
        coded_candidate_scan,
    )

    emb = _mini_embeddings(spark)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx)

    # stage 1: the exact scan the probe constructs
    cand = coded_candidate_scan(spark, idx, [0])
    buf = io.StringIO()
    with redirect_stdout(buf):
        cand.explain(True)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", buf.getvalue())
    assert schemas, buf.getvalue()
    for s in schemas:
        assert "code" in s and "v:" not in s and "nrm" not in s, s

    # stage 2: the full probe's final plan is the rerank — raw vectors
    # fetched by a pushed-down In(vec_id) over the admitted cells
    queries = spark.createDataFrame(
        [(999, [1.0] + [0.0] * 7, 1.0)], "q_id long, qv array<double>, qn double"
    )
    out = ivf_pruned_topk(spark, idx, queries, nprobe=1, topk=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    assert re.search(r"PushedFilters: \[[^\]]*In\(vec_id", plan), plan
    assert out.count() == 3


def test_pruned_topk_matches_own_oracle_and_recall_floor(spark, sf_dir):
    """The two-stage SQ8 probe is pinned against ITS OWN DuckDB oracle
    (SIM_IVF_PRUNED_SQL reproduces the coded shortlist + rerank
    bit-for-bit BY DESIGN) plus a recall floor against the exact float
    probe sim_ivf_topk. Row identity with the float probe is NOT
    guaranteed by construction — it held empirically only because
    IVF_RERANK >= TOPK on these fixtures — so asserting it would make
    the test flake on fixture/DIM/RERANK changes."""
    import duckdb

    from opencypher_datalayer_spark.benchqueries.similarity import (
        SIM_IVF_PRUNED_SQL,
        TOPK,
    )

    got = sorted(
        (r.q_id, r.c_id, r.cosine, r.rk)
        for r in sim_ivf_pruned_topk(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = sorted(tuple(t) for t in con.execute(SIM_IVF_PRUNED_SQL).fetchall())
    assert got and got == want

    exact = {(r.q_id, r.c_id) for r in sim_ivf_topk(spark, sf_dir).collect()}
    pruned = {(q, c) for q, c, _, _ in got}
    recall = len(exact & pruned) / len(exact)
    assert recall >= 0.9, recall


def test_index_is_standing_artifact(spark, sf_dir):
    """r9: the index is a STANDING artifact (operators.artifacts) — it
    survives memo clears (the amortization the r8 verdict asked for),
    the codebook reloaded from it is bit-identical to the trained one,
    and dropping the store forces a genuine rebuild."""
    import os

    import numpy as np

    from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
    from opencypher_datalayer_spark.benchqueries.similarity import (
        _codebook_from_artifact,
        _ivf_codebook,
        _IVF_ARTIFACT_KIND,
        _ivf_artifact_key,
        _ivf_index_dir,
    )
    from opencypher_datalayer_spark.operators.artifacts import default_store

    rows = [tuple(r) for r in sim_ivf_pruned_topk(spark, sf_dir).collect()]
    trained = _ivf_codebook(spark, sf_dir)
    d1 = _ivf_index_dir(spark, sf_dir)
    clear_memo_caches()
    assert os.path.isdir(d1)  # artifact survived the clear
    assert _ivf_index_dir(spark, sf_dir) == d1  # no rebuild
    # a cold session's codebook load reproduces training bit-for-bit
    loaded = _codebook_from_artifact(spark, sf_dir)
    assert loaded[0] == trained[0]
    assert np.array_equal(np.asarray(loaded[1]), np.asarray(trained[1]))
    assert np.array_equal(np.asarray(loaded[2]), np.asarray(trained[2]))
    # and the warm probe answers are unchanged
    assert [tuple(r) for r in sim_ivf_pruned_topk(spark, sf_dir).collect()] == rows

    store = default_store()
    store.drop(kind=_IVF_ARTIFACT_KIND)
    clear_memo_caches()
    assert store.current_dir(_IVF_ARTIFACT_KIND, _ivf_artifact_key(sf_dir)) is None
    assert not os.path.isdir(d1)
    d2 = _ivf_index_dir(spark, sf_dir)  # genuine rebuild (version numbering restarts)
    assert os.path.isdir(d2)
    assert [tuple(r) for r in sim_ivf_pruned_topk(spark, sf_dir).collect()] == rows


def test_spark_trainer_matches_driver_trainer(spark):
    """train_codebook_spark must produce the BIT-IDENTICAL codebook of
    the driver-matmul trainer (exact integer arithmetic is order-free),
    so the TRAIN_DRIVER_MAX_SCORES switch can never change results."""
    import numpy as np

    from opencypher_datalayer_spark.benchqueries.similarity import (
        _norm,
        _vec,
        load_table,
    )
    from opencypher_datalayer_spark.operators import ivf_codebook as cb

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.1").select(
        "vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm")
    )
    vq_df = emb.select("vec_id", cb.vq_expr().alias("vq"))
    n = emb.count()
    ids_d, c_d = cb.train_codebook(cb.collect_sample(vq_df), n)
    ids_s, c_s = cb.train_codebook_spark(vq_df, n)
    assert np.array_equal(ids_d, ids_s)
    assert np.array_equal(c_d, c_s)


def test_filtered_probe_keeps_partition_pruning_and_payload(spark, tmp_path):
    """The filtered probe (match_cols) must not disturb the scan shape:
    payload columns ride the cell partitions, the partition filter
    stays on the scan, and every returned neighbor satisfies the
    match — here parity(vec_id), with cluster 0 split across both
    parities so the filter demonstrably removes half the candidates."""
    emb = _mini_embeddings(spark).withColumn("par", F.col("vec_id") % 2)
    idx = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, idx)

    # payload stored per vector inside the partitions
    cols = spark.read.parquet(f"{idx}/vectors").columns
    assert "par" in cols, cols

    queries = spark.createDataFrame(
        [(999, 1, [1.0] + [0.0] * 7, 1.0)],
        "q_id long, par int, qv array<double>, qn double",
    )
    # cluster 0 (the query's nearest cells) is ALL even vec_ids
    # (j*4+0), so a narrow par=1 probe returns NOTHING — the in-miniature
    # demonstration of why filtered probes must widen nprobe. At
    # nprobe=4 the filtered result is empty:
    narrow = ivf_pruned_topk(spark, idx, queries, nprobe=4, topk=3, match_cols=("par",))
    assert narrow.collect() == []
    # widened to all cells, every hit satisfies the match
    out = ivf_pruned_topk(spark, idx, queries, nprobe=24, topk=3, match_cols=("par",))
    rows = out.collect()
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(True)
    import re

    blocks = re.findall(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert any("cell" in b for b in blocks), blocks
    assert rows and all(r.c_id % 2 == 1 for r in rows), rows

    # unfiltered at the narrow nprobe returns the even cluster-0 ids
    un = ivf_pruned_topk(spark, idx, queries.drop("par"), nprobe=4, topk=3)
    assert any(r.c_id % 2 == 0 for r in un.collect())


def test_needs_compact_growth_boundary(spark, sf_dir, tmp_path):
    """The advisory compact trigger (r10, VERDICT r9 next #4): growth
    below COMPACT_GROWTH_FACTOR is not due, crossing it is, and a
    compact resets the clock (n_trained re-pinned to the grown corpus).
    Exercised through the REAL lifecycle, not fabricated meta."""
    import json
    import os

    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.vector_index import (
        COMPACT_GROWTH_FACTOR,
        compact_ivf_index,
        extend_ivf_index,
        needs_compact,
    )
    from opencypher_datalayer_spark.sources.tables import load_table

    # 1/16 slices: the advisory only reads SIZE RATIOS (growth = corpus
    # over n_trained), so equal-width slices exercise the identical
    # boundary math at a quarter of the data — the full lifecycle
    # (build, two extensions, compact retrain) still runs for real
    emb = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") % 16 < 3)
    base = emb.where(F.col("vec_id") % 16 == 0)
    n_base = base.count()
    store = ArtifactStore(str(tmp_path / "store"))
    kind, key = "ivf", ("drift",)

    def build(d):
        build_ivf_index(spark, base, d)
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump({"n_corpus": int(n_base), "n_trained": int(n_base)}, f)

    v1 = store.get_or_build(kind, key, build)
    sig = needs_compact(spark, v1)
    assert sig["growth"] == 1.0 and not sig["compact_due"]

    # two extensions -> growth 3.0 == the committed boundary (inclusive)
    v2 = extend_ivf_index(spark, store, kind, key, emb.where(F.col("vec_id") % 16 == 1))
    assert not needs_compact(spark, v2)["compact_due"]  # ~2x < boundary
    v3 = extend_ivf_index(spark, store, kind, key, emb.where(F.col("vec_id") % 16 == 2))
    sig3 = needs_compact(spark, v3)
    assert sig3["growth"] >= COMPACT_GROWTH_FACTOR - 0.05 and sig3["compact_due"]
    assert sig3["cells_target"] > sig3["cells_trained"]

    # compact retrains -> the signal resets
    v4 = compact_ivf_index(spark, store, kind, key)
    sig4 = needs_compact(spark, v4)
    assert sig4["growth"] == 1.0 and not sig4["compact_due"]


def test_extension_retry_after_compact_uses_winner_quantizer(spark, tmp_path):
    """An extension that loses its publish CAS to a concurrent
    compact_ivf_index must RE-DERIVE cells and codes from the relinked
    winner's RETRAINED codebook and scales — assigning with the retired
    quantizer would append rows to wrong cells with codes on the wrong
    scale grid, silently corrupting probe results (the ADVICE r11
    medium). The quantizer reads live inside build(tmp) for exactly
    this reason."""
    import numpy as np

    from opencypher_datalayer_spark.operators import artifacts
    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.ivf_codebook import (
        ASSIGN_A,
        assign_cells,
        vq_expr,
    )
    from opencypher_datalayer_spark.operators.vector_index import (
        build_ivf_index,
        compact_ivf_index,
        extend_ivf_index,
        read_codebook,
        read_scales,
        sq8_code_expr,
    )
    from opencypher_datalayer_spark.benchqueries.similarity import _norm, _vec

    root = str(tmp_path / "store")
    plain = ArtifactStore(root)
    kind, key = "ivf", ("race",)

    base = _mini_embeddings(spark)  # amplitude-1 clusters
    plain.get_or_build(kind, key, lambda d: build_ivf_index(spark, base, d))
    v1 = plain.current_dir(kind, key)
    ids1, cq1 = read_codebook(spark, v1)
    scales1 = read_scales(spark, v1)

    # batch B shifts the corpus geometry AND the max-abs scale range,
    # so the compact's retrained codebook/scales provably differ
    rows_b = [(100 + i, [2.5 if d == i % 8 else 0.3 for d in range(8)]) for i in range(24)]
    batch_b = spark.createDataFrame(rows_b, "vec_id long, embedding array<float>")
    extend_ivf_index(spark, plain, kind, key, batch_b)

    class RacingStore(ArtifactStore):
        """Fires one concurrent compact right before the extension's
        first publish attempt, forcing the CAS retry path."""

        fired = False

        def _publish(self, adir, tmp, expected_base):
            if not RacingStore.fired and expected_base is not artifacts._ANY:
                RacingStore.fired = True
                compact_ivf_index(spark, plain, kind, key)
            return super()._publish(adir, tmp, expected_base)

    rows_c = [(200 + i, [1.7 if d == (i + 3) % 8 else -0.4 for d in range(8)]) for i in range(12)]
    batch_c = spark.createDataFrame(rows_c, "vec_id long, embedding array<float>")
    vf = extend_ivf_index(spark, RacingStore(root), kind, key, batch_c)
    assert RacingStore.fired

    # the compact genuinely retrained (else the test is vacuous)
    idsf, cqf = read_codebook(spark, vf)
    scalesf = read_scales(spark, vf)
    assert not (
        len(ids1) == len(idsf)
        and np.array_equal(cq1, cqf)
        and scales1 == scalesf
    )

    # every batch-C row in the final version carries the WINNER
    # quantizer's cell assignment and SQ8 code
    emb_c = batch_c.select("vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm"))
    want = {
        (r.vec_id, r.cell, tuple(r.code))
        for r in assign_cells(emb_c.withColumn("vq", vq_expr()), idsf, cqf, ASSIGN_A)
        .withColumn("code", sq8_code_expr(F.col("v"), scalesf))
        .select("vec_id", "cell", "code")
        .collect()
    }
    got = {
        (r.vec_id, r.cell, tuple(r.code))
        for r in spark.read.parquet(f"{vf}/vectors")
        .where(F.col("vec_id") >= 200)
        .select("vec_id", "cell", "code")
        .collect()
    }
    assert got == want and got


def test_pre_sq8_index_extension_raises_migration_hint(spark, tmp_path):
    """A standing index persisted before the SQ8 layout (no scales/ dir)
    must fail extension with a clear 'run compact_ivf_index to migrate'
    message, not a raw parquet path error — and the compact must indeed
    migrate it (ADVICE r11 low #5)."""
    import shutil

    import pytest

    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.operators.vector_index import (
        build_ivf_index,
        compact_ivf_index,
        extend_ivf_index,
        read_scales,
    )

    plain = ArtifactStore(str(tmp_path / "store"))
    kind, key = "ivf", ("legacy",)

    def legacy_build(d):
        build_ivf_index(spark, _mini_embeddings(spark), d)
        shutil.rmtree(f"{d}/scales")  # simulate the pre-v3 layout

    plain.get_or_build(kind, key, legacy_build)
    batch = spark.createDataFrame(
        [(500, [0.5] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(RuntimeError, match="compact_ivf_index"):
        extend_ivf_index(spark, plain, kind, key, batch)

    # compact retrains the quantizer over the stored vectors -> migrated
    v2 = compact_ivf_index(spark, plain, kind, key)
    assert len(read_scales(spark, v2)) == 8
    extend_ivf_index(spark, plain, kind, key, batch)  # now succeeds


def test_stream_sink_surfaces_compact_signal(spark, tmp_path):
    """StreamingVectorIngest refreshes last_compact_signal per committed
    epoch (bootstrap included) and exposes compact_signal() on demand."""
    from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
    from opencypher_datalayer_spark.streaming.vector_ingest import (
        StreamingVectorIngest,
    )

    sink = StreamingVectorIngest(
        ArtifactStore(str(tmp_path / "s")), key=("sig",), dup_cos=0.999999
    )
    assert sink.compact_signal(spark) is None  # before bootstrap
    b0 = _mini_embeddings(spark)
    sink.apply(b0, epoch_id=0)
    assert sink.last_compact_signal is not None
    assert not sink.last_compact_signal["compact_due"]
    # grow the corpus well past the boundary in one epoch: distinct
    # directions (nothing near-parallel, so nothing collapses)
    rows = []
    for i in range(120):
        v = [0.0] * 8
        v[i % 8] = 1.0
        v[(i // 8) % 8] += 0.31 + 0.013 * i
        rows.append((1000 + i, v))
    b2 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sink.apply(b2, epoch_id=1)
    assert sink.last_compact_signal["compact_due"]
    assert sink.compact_signal(spark)["compact_due"]


def test_float_probe_matches_inline_ivf(spark, sf_dir):
    """``coded=False`` (the noise-tier plan SCALE.md §ivf-sq8-d256
    ships): one exact float scan of the admitted cells — row-identical
    to the inline ``sim_ivf_topk`` BY CONSTRUCTION (same quantizer,
    same cell admission, same exact scoring/rounding/tie-breaks), with
    no rerank-budget dependence."""
    from opencypher_datalayer_spark.benchqueries.similarity import (
        N_QUERY,
        TOPK,
        _ivf_index_dir,
        _norm,
        _vec,
        load_table,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", _vec().alias("v"), _norm(_vec()).alias("nrm")
    )
    queries = emb.where(F.col("vec_id") < N_QUERY).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    got = [
        tuple(r)
        for r in ivf_pruned_topk(
            spark, _ivf_index_dir(spark, sf_dir), queries, topk=TOPK, coded=False
        ).collect()
    ]
    want = [tuple(r) for r in sim_ivf_topk(spark, sf_dir).collect()]
    assert got == want and got


def test_serving_plan_picks_tier_by_measurement(spark, tmp_path):
    """VERDICT r12 next #5: the serving tier is a MEASURED call, not
    the caller's guess. A family-tier corpus (planted clusters, cosine
    gaps far above the SQ8 quantization noise) calibrates to the coded
    two-stage at the default rerank and holds the floor there. A
    quantization-degenerate corpus — every vector on the SAME int8
    grid points (shared integer grid coordinates, sub-half-step
    perturbations carrying all the cosine signal), so every stored
    code is IDENTICAL and the coded ordering is pure tie-break noise —
    fails the affordable coded steps (the >=corpus rungs are skipped:
    a coded stage reranking the whole corpus is strictly more work
    than the float scan) and calibrates to the FLOAT probe, which
    meets the floor by admission. (The full-scale noise-tier
    measurement is scripts/ivf_sq8_d256_rehearsal.py / SCALE.md
    §ivf-sq8-d256.)"""
    import numpy as np

    from opencypher_datalayer_spark.operators.vector_index import (
        ivf_auto_topk,
        ivf_serving_plan,
    )

    rng = np.random.default_rng(7)
    dim, topk = 32, 3

    def emb_df(mat):
        return spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
            "vec_id long, embedding array<float>",
        )

    # family tier: 40 clusters x 8 members, in-family cos >> cross
    centers = rng.normal(size=(40, dim))
    fam = np.repeat(centers, 8, axis=0) + 0.05 * rng.normal(size=(320, dim))
    # quantization-degenerate tier: shared small integer grid vector K
    # times u (u a power of two; a planted 127u row pins every scale to
    # exactly u), plus sub-half-step perturbations — codes all equal K
    u = 1.0 / 64.0
    K = rng.integers(-3, 4, size=dim).astype(np.float64)
    noise = K[None, :] * u + 0.2 * u * rng.uniform(-1, 1, size=(320, dim))
    noise = np.vstack([noise, np.full((1, dim), 127.0 * u)])  # scale pin

    plans = {}
    for name, mat in (("family", fam), ("noise", noise)):
        d = str(tmp_path / name)
        build_ivf_index(spark, emb_df(mat), d)
        plan = ivf_serving_plan(spark, d, topk=topk)
        plans[name] = plan
        assert plan["measured_recall"] >= 0.9, (name, plan)
        # the served result IS the calibrated plan's result
        q = spark.createDataFrame(
            [(9001, [float(x) for x in mat[5]], float(np.linalg.norm(mat[5])))],
            "q_id long, qv array<double>, qn double",
        )
        assert ivf_auto_topk(spark, d, q, topk=topk, plan=plan).count() == topk
    assert plans["family"]["coded"] and plans["family"]["rerank"] == 20
    noise_plan = plans["noise"]
    assert not noise_plan["coded"] and noise_plan["rerank"] is None
    # the failing coded steps were genuinely measured, not assumed
    coded_steps = [s for s in noise_plan["steps"] if "coded_recall" in s]
    assert coded_steps and all(s["coded_recall"] < 0.9 for s in coded_steps)
