"""ANN quality floor (VERDICT r6 #1): the production answer path must
meet a MEASURED recall target, not an asserted one. Since r8 the
committed operating point is the trained-codebook nprobe step table
(operators/ivf_codebook.py NPROBE_STEPS — probe fraction 0.25/0.36/
0.096 at n=500/2k/200k, falling with scale); the floor is mean
recall@5 >= RECALL_FLOOR (0.9), measured in this suite at sf0.01 and
sf0.1 and recorded per-round by bench.py's ``recall`` artifact key
(sf10 numbers live in SCALE.md §recall)."""

from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries import similarity as sim


def _hits(spark, sf_dir) -> tuple[int, int]:
    """(total true-neighbor hits, total truth rows) as exact ints —
    avoids float-mean edge cases at the floor boundary."""
    rows = sim.sim_ivf_recall(spark, sf_dir).collect()
    total = sum(int(round(r.recall * sim.TOPK)) for r in rows)
    return total, len(rows) * sim.TOPK


def test_ivf_recall_floor_sf001(spark):
    hits, n = _hits(spark, "/root/testdata/sf0.01")
    assert hits >= sim.RECALL_FLOOR * n, f"mean recall {hits/n:.3f} < floor"


def test_ivf_recall_floor_sf01(spark):
    hits, n = _hits(spark, "/root/testdata/sf0.1")
    assert hits >= sim.RECALL_FLOOR * n, f"mean recall {hits/n:.3f} < floor"


def test_multiband_recall_dominates_single_band(spark):
    """AND-OR amplification invariant: band 0 of the multiband pool IS
    the single-band plane set, so the multiband candidate hits are a
    superset and recall@5 is per-query >= the single-band recall."""
    sf = "/root/testdata/sf0.01"
    multi = {r.q_id: r.recall for r in sim.sim_ann_recall(spark, sf).collect()}

    # single-band recall via the same truth frame against band-0 buckets
    exact = sim.sim_topk_bruteforce(spark, sf).select("q_id", "c_id")
    emb = sim.load_table(spark, "embeddings", sf).select(
        "vec_id", sim._vec().alias("v")
    )
    bk = emb.select(
        "vec_id", sim._bucket_col(sim.ALL_PLANES[: sim._lsh_n_planes(sf)]).alias("b")
    )
    q = bk.select(F.col("vec_id").alias("q_id"), F.col("b").alias("qb"))
    c = bk.select(F.col("vec_id").alias("c_id"), F.col("b").alias("cb"))
    single = {
        r.q_id: r.recall
        for r in exact.join(q, "q_id")
        .join(c, "c_id")
        .withColumn("hit", F.when(F.col("qb") == F.col("cb"), 1))
        .groupBy("q_id")
        .agg((F.count("hit") / F.lit(sim.TOPK)).alias("recall"))
        .collect()
    }
    assert set(multi) == set(single)
    for q_id, r in multi.items():
        assert r >= single[q_id] - 1e-9


def _filtered_hits(spark, sf_dir) -> tuple[int, int]:
    """(same-label true-neighbor hits, truth rows) for the FILTERED
    probe (sim_filtered_topk) vs exact same-label brute-force."""
    exact_rows = (
        sim.load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "label", sim._vec().alias("v"))
        .collect()
    )
    import numpy as np

    by_id = {r.vec_id: (np.array(r.v, dtype=np.float64), r.label) for r in exact_rows}
    truth = set()
    for q in range(sim.N_QUERY):
        qv, ql = by_id[q]
        qn = np.sqrt((qv * qv).sum())
        scored = sorted(
            (
                (-round(float(qv @ cv) / (qn * np.sqrt((cv * cv).sum())), 6), c)
                for c, (cv, cl) in by_id.items()
                if c != q and cl == ql
            ),
        )[: sim.TOPK]
        truth |= {(q, c) for _, c in scored}
    got = {
        (r.q_id, r.c_id) for r in sim.sim_filtered_topk(spark, sf_dir).collect()
    }
    return len(truth & got), len(truth)


def test_filtered_recall_floor_sf001(spark):
    """The measured widening rule (ivf_filtered_nprobe) must hold the
    same floor for the FILTERED probe that the unfiltered step table
    holds for the plain one — unwidened probes measured 0.58 here."""
    hits, n = _filtered_hits(spark, "/root/testdata/sf0.01")
    assert hits >= sim.RECALL_FLOOR * n, f"filtered recall {hits/n:.3f} < floor"


def test_filtered_recall_floor_sf01(spark):
    hits, n = _filtered_hits(spark, "/root/testdata/sf0.1")
    assert hits >= sim.RECALL_FLOOR * n, f"filtered recall {hits/n:.3f} < floor"


def _planted_hits(spark, sf_dir) -> tuple[int, int]:
    rows = sim.dedup_embedding_recall(spark, sf_dir).collect()
    return sum(1 for r in rows if r.shared_cell), len(rows)


def test_embedding_dedup_planted_recall_floor(spark):
    """VERDICT r10 'wrong' #3: the embedding-dedup CANDIDATE GENERATOR
    must recall >= DEDUP_EMB_RECALL_FLOOR of planted true cos>=DUP_COS
    pairs. Shared-IVF-cell candidates measure 1.0 (sf0.001) and 0.98
    (sf0.01) here; the hyperplane buckets the family used before r11
    measured 0.30-0.33 on the same pairs — the migration's evidence."""
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        hits, n = _planted_hits(spark, sf_dir)
        assert n >= 50, f"too few planted true pairs at {sf_dir}: {n}"
        assert hits >= sim.DEDUP_EMB_RECALL_FLOOR * n, (
            f"planted recall {hits}/{n} < floor at {sf_dir}"
        )


def test_emb_dup_pairs_probe_matches_live_assignment(spark, monkeypatch):
    """r12 (VERDICT r11 next #2): the coded-index pair stage — arank
    slice of the standing index + SQ8 candidate screen + bounded exact
    rescore — must emit the IDENTICAL pair set as the live path
    (corpus re-assignment + full blocked-matmul scoring). The sound
    quantization bound guarantees no pair is lost; the exact rescore
    guarantees no extra pair survives. (The same equivalence was
    rehearsed at sf10: 3812 == 3812 pairs.)"""
    import numpy as np
    import pandas as pd

    from opencypher_datalayer_spark.operators.ivf_codebook import (
        assign_cells,
        vq_expr,
    )
    from opencypher_datalayer_spark.streaming.vector_ingest import (
        _dup_pairs_within,
    )

    # force the PROBE path below the small-corpus gate — equivalence
    # with the live path is exactly what this test pins
    monkeypatch.setattr(sim, "EMB_PROBE_MIN_CORPUS", 0)

    def both_paths(sf_dir):
        new = {
            (r.doc_a, r.doc_b) for r in sim._emb_dup_pairs(spark, sf_dir).collect()
        }
        emb, (n, ids, cq), _ = sim._ivf_parts(spark, sf_dir)
        passign = assign_cells(
            emb.withColumn("vq", vq_expr()), ids, cq, sim.DEDUP_PAIR_A
        )
        old = {
            (r.doc_a, r.doc_b)
            for r in _dup_pairs_within(
                passign.select("vec_id", "cell", "v", "nrm"), sim.DUP_COS
            ).collect()
        }
        return new, old

    # real corpus (sf0.1 is the smallest testdata scale with a genuine
    # cos>=DUP_COS pair; smaller scales have none — both paths empty)
    new, old = both_paths("/root/testdata/sf0.1")
    assert new == old and new

    # constructed pair-dense corpus: 30 planted twin pairs (cos spread
    # around the threshold) + 140 independent fillers — a non-vacuous
    # equivalence over many threshold-straddling decisions
    import tempfile

    rng = np.random.RandomState(5)
    rows = []
    for i in range(140):
        rows.append((i, rng.randn(sim.DIM).astype(np.float32)))
    for j in range(30):
        base = rng.randn(sim.DIM)
        mix = rng.randn(sim.DIM)
        alpha = 0.3 + 0.05 * j  # twins from far-above to near threshold
        twin = base + alpha * np.linalg.norm(base) * mix / np.linalg.norm(mix)
        rows.append((1000 + 2 * j, base.astype(np.float32)))
        rows.append((1001 + 2 * j, twin.astype(np.float32)))
    tmp_sf = tempfile.mkdtemp()
    pd.DataFrame(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
            "label": [0] * len(rows),
        }
    ).to_parquet(f"{tmp_sf}/embeddings.parquet")
    new, old = both_paths(tmp_sf)
    assert new == old and len(new) >= 10, (len(new), len(old))


def test_emb_dup_pairs_candidate_scan_prunes_raw_vectors(spark, sf_dir):
    """The coded pair stage's candidate scan must read ONLY
    (vec_id, cell, code, nrm) with the arank slice pushed into the scan
    — the raw v column (8 bytes/dim) never leaves the parquet footer
    before the bounded rescore fetch."""
    import io
    import re
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    idx = sim._ivf_index_dir(spark, sf_dir)
    slim = (
        spark.read.parquet(f"{idx}/vectors")
        .where(F.col("arank") < sim.DEDUP_PAIR_A)
        .select("vec_id", "cell", "code", "nrm")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        slim.explain(True)
    plan = buf.getvalue()
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        assert "code" in s and "arank" in s and "v:" not in s, s
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(arank", plan), plan


def test_emb_dup_pairs_extended_index_falls_back_to_live(spark, monkeypatch):
    """An extension-grown index can hold CLIPPED codes, which void the
    |e_d| <= s_d/2 quantization bound — the probe path must detect the
    growth (meta n_corpus != n_trained) and fall back to the live
    assignment scoring."""
    from opencypher_datalayer_spark.operators import vector_index as vi
    from opencypher_datalayer_spark.streaming import vector_ingest as ving

    # below the small-corpus gate everything is live anyway — drop the
    # gate so the META fallback is what gets exercised
    monkeypatch.setattr(sim, "EMB_PROBE_MIN_CORPUS", 0)
    sf = "/root/testdata/sf0.001"
    baseline = {(r.doc_a, r.doc_b) for r in sim._emb_dup_pairs(spark, sf).collect()}

    called = {"live": 0}
    orig = ving._dup_pairs_within

    def spy(assign, t):
        called["live"] += 1
        return orig(assign, t)

    monkeypatch.setattr(ving, "_dup_pairs_within", spy)
    monkeypatch.setattr(
        vi, "index_meta", lambda d: {"n_corpus": 2, "n_trained": 1}
    )
    via_live = {(r.doc_a, r.doc_b) for r in sim._emb_dup_pairs(spark, sf).collect()}
    assert called["live"] == 1
    assert via_live == baseline
