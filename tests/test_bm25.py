"""BM25 inverted-index artifact: probe correctness, O(batch) extension
equivalence, compact neutrality, bucket pruning."""

from __future__ import annotations

import pytest

from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.bm25_index import (
    COMPACT_GENERATIONS,
    _merged_meta,
    bm25_scores,
    compact_bm25_index,
    extend_bm25_index,
    generations,
    index_meta,
    needs_compact,
    read_bm25_index,
    write_bm25_index,
)

KIND = "bm25_test"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps on the warm mat"),
    (2, "a slow green turtle crawls under the old bridge"),
    (3, "quick quick quick brown brown fox"),
    (4, "entirely disjoint vocabulary zeta omega lambda"),
    (5, ""),  # token-less doc still counts toward N
]

BATCH = [
    (10, "the quick red fox runs past the brown dog"),
    (11, "new unseen words arrive with this batch"),
]


def _queries(spark):
    return spark.createDataFrame(
        [(0, ["quick", "brown", "fox"]), (1, ["zeta", "bridge"])],
        "q_id bigint, toks array<string>",
    )


def _probe(spark, adir):
    return {
        (r.q_id, r.doc_id): r.s_int
        for r in bm25_scores(spark, adir, _queries(spark)).collect()
    }


def test_extension_equals_rebuild(spark, tmp_path):
    """Extending the standing index with a disjoint batch is
    content-equivalent to a full rebuild over the grown corpus — df,
    N, and sum_dl deltas SUM to the exact grown-corpus values."""
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, BATCH))
    store.commit(
        KIND, ("full",), lambda t: write_bm25_index(_docs(spark, CORPUS + BATCH), t)
    )
    ext = _probe(spark, store.current_dir(KIND, ("a",)))
    full = _probe(spark, store.current_dir(KIND, ("full",)))
    assert ext == full and len(ext) > 0


def test_compact_is_content_neutral(spark, tmp_path):
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    for i in range(3):
        extend_bm25_index(
            spark, store, KIND, ("a",), _docs(spark, [(100 + i, "quick extra doc")])
        )
    before = _probe(spark, store.current_dir(KIND, ("a",)))
    assert generations(spark, store.current_dir(KIND, ("a",))) == 4
    compact_bm25_index(spark, store, KIND, ("a",))
    adir = store.current_dir(KIND, ("a",))
    assert generations(spark, adir) == 1
    assert _probe(spark, adir) == before


def test_compact_cas_preserves_racing_extension(spark, tmp_path):
    """An extension that commits between compact's read of the base
    version and its publish must survive: compact publishes via CAS on
    the base, loses, and re-merges over the GROWN index — neither the
    extension's docs nor its ``last_epoch`` replay marker vanish (a
    plain commit would erase both, reopening the epoch's replay
    window)."""
    store = ArtifactStore(str(tmp_path))
    store.commit(
        KIND,
        ("a",),
        lambda t: write_bm25_index(
            _docs(spark, CORPUS), t, meta_extra={"last_epoch": 3}
        ),
    )
    extend_bm25_index(
        spark, store, KIND, ("a",),
        _docs(spark, [(100, "quick extra doc")]), meta_extra={"last_epoch": 4},
    )
    raced = []
    orig = store.commit_if_current

    def racing(kind, key, builder, expected_base):
        if not raced:  # fire once: between compact's read and its publish
            raced.append(expected_base)
            extend_bm25_index(
                spark, ArtifactStore(str(tmp_path)), kind, key,
                _docs(spark, BATCH), meta_extra={"last_epoch": 7},
            )
        return orig(kind, key, builder, expected_base)

    store.commit_if_current = racing
    compact_bm25_index(spark, store, KIND, ("a",))
    assert raced  # the race really happened (and the CAS retried past it)
    adir = store.current_dir(KIND, ("a",))
    assert generations(spark, adir) == 1  # compacted
    assert index_meta(adir)["last_epoch"] == 7  # marker not rolled back
    store.commit(
        KIND,
        ("full",),
        lambda t: write_bm25_index(
            _docs(spark, CORPUS + [(100, "quick extra doc")] + BATCH), t
        ),
    )
    assert _probe(spark, adir) == _probe(spark, store.current_dir(KIND, ("full",)))


def test_compact_shares_postings_inodes(spark, tmp_path):
    """Compact is O(stats): the postings tree (the only O(corpus)
    relation) is hard-linked from the base version, never rewritten —
    every postings data file in the compacted version is the SAME inode
    as the base's."""
    import os

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, BATCH))
    old = store.current_dir(KIND, ("a",))
    compact_bm25_index(spark, store, KIND, ("a",))
    new = store.current_dir(KIND, ("a",))
    assert new != old

    def inodes(vdir):
        root = os.path.join(vdir, "postings")
        return {
            os.stat(os.path.join(dp, f)).st_ino
            for dp, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        }

    assert inodes(new) == inodes(old) and inodes(new)
    # stats/corpus were genuinely rewritten (merged to one generation)
    assert generations(spark, new) == 1


def test_merged_meta_marker_is_monotonic():
    """On a CAS-retry relink the base meta may carry a HIGHER replay
    marker than this writer's epoch — the merge must never move it
    backward."""
    assert _merged_meta({"last_epoch": 9, "x": 1}, {"last_epoch": 4}) == {
        "last_epoch": 9,
        "x": 1,
    }
    assert _merged_meta({"last_epoch": 4}, {"last_epoch": 9})["last_epoch"] == 9
    assert _merged_meta({}, {"last_epoch": 2}) == {"last_epoch": 2}
    assert _merged_meta({"last_epoch": 2}, None) == {"last_epoch": 2}
    assert _merged_meta({"a": 1}, {"b": 2}) == {"a": 1, "b": 2}


def test_generation_counters_match_ground_truth(spark, tmp_path):
    """The O(1) meta counters (r12 weak #1 fix) track the REAL delta
    chain exactly: build=1/1, each extension +1/+1, the stats-only
    compact resets generations but carries postings_generations, the
    full merge resets both. Ground truth = the corpus delta frame's
    row count (one row per build/extend batch)."""
    from opencypher_datalayer_spark.operators.bm25_index import (
        CORPUS as CORPUS_FRAME,
        postings_generations,
    )

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    for i in range(2):
        extend_bm25_index(
            spark, store, KIND, ("a",), _docs(spark, [(100 + i, "quick extra doc")])
        )
    adir = store.current_dir(KIND, ("a",))
    m = index_meta(adir)
    assert m["generations"] == 3 and m["postings_generations"] == 3
    assert read_bm25_index(spark, adir)[CORPUS_FRAME].count() == 3  # ground truth
    compact_bm25_index(spark, store, KIND, ("a",))  # stats-only
    adir = store.current_dir(KIND, ("a",))
    assert index_meta(adir)["generations"] == 1
    assert index_meta(adir)["postings_generations"] == 3  # tree still fragmented
    extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, [(300, "more quick")]))
    adir = store.current_dir(KIND, ("a",))
    assert index_meta(adir)["generations"] == 2
    assert index_meta(adir)["postings_generations"] == 4
    compact_bm25_index(spark, store, KIND, ("a",), merge_postings=True)
    adir = store.current_dir(KIND, ("a",))
    assert generations(spark, adir) == 1 and postings_generations(spark, adir) == 1


def test_driver_side_extension_equals_spark_path(spark, tmp_path, monkeypatch):
    """A small batch's extension derives stats/blocks/corpus DRIVER-side
    (pandas over the scratch postings — zero extra Spark jobs); forcing
    the cap to 0 runs the distributed path on the same batch. Both must
    yield identical probe scores AND identical read-back frames — the
    integer aggregates are exact either way."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    monkeypatch.setattr(bm, "BM25_BLOCK", 2)  # multi-block terms in the build
    batch = CORPUS[3:] + [(50, ""), (51, "quick unseen zeta")]  # incl. token-less
    frames = {}
    for mode, cap in (("driver", bm.EXTEND_DRIVER_STATS_MAX_BYTES), ("spark", 0)):
        monkeypatch.setattr(bm, "EXTEND_DRIVER_STATS_MAX_BYTES", cap)
        store = ArtifactStore(str(tmp_path / mode))
        store.commit(
            KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS[:3]), t)
        )
        extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, batch))
        adir = store.current_dir(KIND, ("a",))
        got = read_bm25_index(spark, adir)
        frames[mode] = {
            name: sorted(map(tuple, df.collect())) for name, df in got.items()
        }
        frames[mode]["probe"] = sorted(_probe(spark, adir).items())
    assert frames["driver"] == frames["spark"]
    # and the n_docs hint changes nothing (it only skips the count job)
    store = ArtifactStore(str(tmp_path / "hint"))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS[:3]), t))
    extend_bm25_index(
        spark, store, KIND, ("a",), _docs(spark, batch), n_docs=len(batch)
    )
    adir = store.current_dir(KIND, ("a",))
    got = {n: sorted(map(tuple, df.collect())) for n, df in read_bm25_index(spark, adir).items()}
    got["probe"] = sorted(_probe(spark, adir).items())
    assert got == frames["driver"]


def test_generations_fallback_on_precounter_meta(spark, tmp_path):
    """A pre-counter index (meta without the counters — long-lived
    streaming keys) still answers the advisory correctly via the
    corpus-frame count."""
    import json
    import os

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, BATCH))
    adir = store.current_dir(KIND, ("a",))
    m = index_meta(adir)
    m.pop("generations"), m.pop("postings_generations")
    with open(os.path.join(adir, "meta.json"), "w") as f:
        json.dump(m, f)
    assert generations(spark, adir) == 2  # corpus-count fallback
    from opencypher_datalayer_spark.operators.bm25_index import compact_signal

    sig = compact_signal(spark, adir)
    assert sig["generations"] == 2 and sig["postings_generations"] == 2
    # the offline compact path upgrades a legacy index to counters
    compact_bm25_index(spark, store, KIND, ("a",))
    m2 = index_meta(store.current_dir(KIND, ("a",)))
    assert m2["generations"] == 1 and m2["postings_generations"] == 2


def test_needs_compact_is_generation_advisory(spark, tmp_path):
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    adir = store.current_dir(KIND, ("a",))
    assert not needs_compact(spark, adir)
    for i in range(COMPACT_GENERATIONS - 1):
        extend_bm25_index(spark, store, KIND, ("a",), _docs(spark, [(200 + i, "x y")]))
    assert needs_compact(spark, store.current_dir(KIND, ("a",)))


def test_probe_scan_is_bucket_pruned(spark, tmp_path):
    """The probe's postings/stats scans carry a partition filter on
    ``bucket`` — the query terms' buckets, pruned at the source."""
    import io
    import re
    from contextlib import redirect_stdout

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    adir = store.current_dir(KIND, ("a",))
    post = read_bm25_index(spark, adir)["postings"]
    assert post.select("bucket").distinct().count() > 1  # corpus spans buckets
    out = bm25_scores(spark, adir, _queries(spark))
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(True)
    blocks = re.findall(r"PartitionFilters: \[([^\]]*)\]", buf.getvalue())
    assert blocks and all("bucket" in b for b in blocks), blocks


def test_maxscore_topk_skips_hot_terms_on_skewed_df(spark, tmp_path):
    """MaxScore-lite on a skewed-df corpus: a stop-word-ish term (in
    every document) must be classified NON-ESSENTIAL — candidates come
    from the rare terms' postings, and the hot term's rows are fetched
    with a pushed-down doc_id IN (candidates) point lookup instead of
    an end-to-end list read. Results stay EXACTLY the naive top-k."""
    import io
    import re
    from contextlib import redirect_stdout

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators.bm25_index import bm25_topk

    # 200 docs all containing 'the' (df=200, low idf -> low impact);
    # rare informative terms appear in a handful of docs each
    rows = []
    for i in range(200):
        toks = ["the", "the", f"filler{i % 37}"]
        if i % 23 == 0:
            toks.append("zebra")
        if i % 31 == 0:
            toks.append("quark")
        rows.append((i, " ".join(toks)))
    store = ArtifactStore(str(tmp_path))
    store.commit(
        KIND, ("a",), lambda t: write_bm25_index(_docs(spark, rows), t)
    )
    adir = store.current_dir(KIND, ("a",))
    q = spark.createDataFrame(
        [(1000, ["the", "zebra", "quark"])], "q_id bigint, toks array<string>"
    )
    out = bm25_topk(spark, adir, q, 5, min_docs=0)  # force the skip phases

    # exact equivalence with the full-scoring path
    w = Window.partitionBy("q_id").orderBy(
        F.col("s_int").desc(), F.col("doc_id").asc()
    )
    naive = (
        bm25_scores(spark, adir, q)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
    )
    got = [(r.doc_id, r.s_int) for r in out.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 5).orderBy("rk").collect()]
    want = [(r.doc_id, r.s_int) for r in naive.orderBy("rk").collect()]
    assert got == want and len(got) == 5

    # plan audit: the non-essential fetch pushes BOTH In(tok) and
    # In(doc_id) into its postings scan — the hot list is read at
    # row-group granularity, never end-to-end
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(True)
    plan = buf.getvalue()
    assert re.search(r"PushedFilters: \[.*In\(tok", plan), plan
    assert re.search(r"PushedFilters: \[.*In\(doc_id", plan), plan


def test_scores_match_reference_formula(spark, tmp_path):
    """Pin the pinned scoring point against an independent pure-Python
    computation (rational idf, floor onto the 1e-9 grid)."""
    import math

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    got = _probe(spark, store.current_dir(KIND, ("a",)))

    docs = {d: t.split() for d, t in CORPUS}
    n = len(docs)
    sumdl = sum(len(v) for v in docs.values())
    avgdl = float(sumdl) / float(n)
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    want = {}
    for q_id, qtoks in [(0, ["quick", "brown", "fox"]), (1, ["zeta", "bridge"])]:
        for d, toks in docs.items():
            s = 0
            for t in set(qtoks):
                tf = toks.count(t)
                if not tf:
                    continue
                idf = (n - df[t] + 0.5) / (df[t] + 0.5) + 1.0
                sat = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (len(toks) / avgdl)))
                s += math.floor(idf * sat * 1e9)
            if s:
                want[(q_id, d)] = s
    assert got == want


def test_log_idf_variant_ranks(spark, tmp_path):
    """The textbook log-idf variant runs and never emits a negative
    term score (the +1 inside the log floors idf at 0)."""
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("a",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    rows = bm25_scores(
        spark, store.current_dir(KIND, ("a",)), _queries(spark), idf="log"
    ).collect()
    assert rows and all(r.s_int >= 0 for r in rows)
    with pytest.raises(ValueError):
        bm25_scores(spark, store.current_dir(KIND, ("a",)), _queries(spark), idf="bad")


def _hot_blockadmit_args(spark, adir, q):
    """White-box preamble shared by the block-max tests: the probe ctx
    plus the exact ``_block_admit_predicate`` argument tuple for the
    single-essential-'hot'-term query over the skewed corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators import bm25_index as bm

    ctx = bm._ProbeCtx(spark, adir, q)
    idf = bm._idf_expr(float(ctx.n_docs))
    stats_q = (
        ctx.pruned(ctx.frames[bm.STATS])
        .groupBy("tok")
        .agg(
            F.sum("df").alias("df"),
            F.max("max_tf").alias("max_tf"),
            F.min("min_dl").alias("min_dl"),
        )
        .withColumn(
            "u", bm._ti_expr(idf, F.col("max_tf"), F.col("min_dl"), ctx.avgdl)
        )
        .collect()
    )
    u_of = {r.tok: (int(r.u), int(r.df)) for r in stats_q}
    seed_rows = (
        ctx.pruned(ctx.frames[bm.POSTINGS], ["hot"])
        .where(F.col("doc_id") != 9999)
        .withColumn("df", F.lit(u_of["hot"][1]))
        .withColumn("ti", bm._ti_expr(idf, F.col("tf"), F.col("dl"), ctx.avgdl))
    )
    theta_rows = (
        seed_rows.withColumn("rk", F.row_number().over(
            Window.orderBy(F.col("ti").desc(), F.col("doc_id").asc())
        ))
        .where(F.col("rk") == 5)
        .collect()
    )
    theta = {9999: int(theta_rows[0].ti)}
    args = (
        ctx, [(9999, "hot", u_of["hot"][1])], {9999: ["hot"]}, u_of, theta,
        float(ctx.n_docs), ctx.avgdl, bm.K1, bm.B,
    )
    return ctx, args


def test_blockmax_skips_low_impact_blocks_of_essential_term(
    spark, tmp_path, monkeypatch
):
    """Block-max (r12, VERDICT r11 next #4): term-level MaxScore cannot
    skip an ESSENTIAL term's posting run — block-level (max_tf, min_dl)
    bounds can. Corpus: one hot term in 3000 docs whose high-impact
    postings (tf=20, short docs) are concentrated in doc_ids 0-47; the
    single-term query makes the term essential, yet only the leading
    blocks can reach theta. Pins: (a) the admit predicate skips blocks
    and carries pushed-down doc_id ranges, (b) the top-k equals the
    naive full scoring exactly, (c) a legacy block-less index answers
    identically through the term-level path."""
    import io
    import re
    import shutil
    from contextlib import redirect_stdout

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators import bm25_index as bm
    from opencypher_datalayer_spark.operators.bm25_index import bm25_topk

    monkeypatch.setattr(bm, "BM25_BLOCK", 64)  # force multi-block terms
    rows = []
    for i in range(3000):
        if i < 48:
            rows.append((i, "hot " * 20))  # tf=20, dl=20 -> high impact
        else:
            rows.append((i, "hot " + "pad " * 60))  # tf=1, dl=61 -> low
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("bm",), lambda t: write_bm25_index(_docs(spark, rows), t))
    adir = store.current_dir(KIND, ("bm",))
    q = spark.createDataFrame([(9999, ["hot"])], "q_id bigint, toks array<string>")

    out = bm25_topk(spark, adir, q, 5, min_docs=0)
    w = Window.partitionBy("q_id").orderBy(F.col("s_int").desc(), F.col("doc_id").asc())
    got = [
        (r.doc_id, r.s_int)
        for r in out.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .orderBy("rk")
        .collect()
    ]
    naive = bm25_scores(spark, adir, q)
    want = [
        (r.doc_id, r.s_int)
        for r in naive.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .orderBy("rk")
        .collect()
    ]
    assert got == want and len(got) == 5
    assert all(d < 48 for d, _ in got)  # the high-impact band wins

    # white-box: the predicate skips blocks and its doc_id ranges reach
    # the parquet scan as pushed-down filters
    ctx, args = _hot_blockadmit_args(spark, adir, q)
    pred, skipped = bm._block_admit_predicate(*args)
    assert skipped and pred is not None
    scan = ctx.pruned(ctx.frames[bm.POSTINGS], ["hot"]).where(pred)
    assert scan.count() < 3000  # blocks genuinely skipped
    assert scan.count() >= 48  # every high-impact posting admitted
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain(True)
    plan = buf.getvalue()
    assert re.search(r"PushedFilters: \[[^\]]*doc_id", plan), plan

    # legacy degradation: strip blocks/ -> same answers via term-level
    legacy = str(tmp_path / "legacy")
    shutil.copytree(adir, legacy)
    shutil.rmtree(f"{legacy}/{bm.BLOCKS}")
    got2 = [
        (r.doc_id, r.s_int)
        for r in bm25_topk(spark, legacy, q, 5, min_docs=0)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .orderBy("rk")
        .collect()
    ]
    assert got2 == want


def test_blockmax_ranges_cap_revert_counts_as_no_skip(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: a term whose admitted blocks exceed
    ``BM25_BLOCKMAX_RANGES_MAX`` reverts to full-admit — that revert
    excludes NOTHING, so it must not flag the phase as having skipped
    (the all-admitting predicate sent bm25_topk down the strictly-
    more-work block path). Same corpus/query as the skip test, which
    genuinely skips at the default cap; with the cap forced to 0 every
    term reverts and the predicate must come back (None, False)."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    monkeypatch.setattr(bm, "BM25_BLOCK", 64)
    rows = [
        (i, "hot " * 20) if i < 48 else (i, "hot " + "pad " * 60)
        for i in range(3000)
    ]
    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("bm",), lambda t: write_bm25_index(_docs(spark, rows), t))
    adir = store.current_dir(KIND, ("bm",))
    q = spark.createDataFrame([(9999, ["hot"])], "q_id bigint, toks array<string>")
    _, args = _hot_blockadmit_args(spark, adir, q)
    pred, skipped = bm._block_admit_predicate(*args)
    assert skipped and pred is not None  # sanity: default cap skips
    monkeypatch.setattr(bm, "BM25_BLOCKMAX_RANGES_MAX", 0)
    pred0, skipped0 = bm._block_admit_predicate(*args)
    assert pred0 is None and not skipped0


def test_blockmax_stays_exact_over_extended_index(spark, tmp_path, monkeypatch):
    """Extensions record ONE coarse block per (term, batch) — the
    cheap-but-sound coverage — so an extended index mixes fine base
    blocks with coarse extension blocks. The skip must stay exact:
    base holds the low-impact tail, the extension carries the
    high-impact docs (so coarse extension blocks are the ones that
    must be admitted), and the top-k equals naive full scoring."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators import bm25_index as bm
    from opencypher_datalayer_spark.operators.bm25_index import bm25_topk

    monkeypatch.setattr(bm, "BM25_BLOCK", 64)
    low = [(i, "hot " + "pad " * 60) for i in range(2500)]  # tf=1, long
    high = [(5000 + i, "hot " * 20) for i in range(40)]  # tf=20, short
    store = ArtifactStore(str(tmp_path))
    store.commit(
        KIND, ("x",), lambda t: write_bm25_index(_docs(spark, low), t)
    )
    extend_bm25_index(spark, store, KIND, ("x",), _docs(spark, high))
    adir = store.current_dir(KIND, ("x",))
    # the blocks frame really is mixed: base chunks + one batch block
    blocks = read_bm25_index(spark, adir)[bm.BLOCKS]
    per_gen = blocks.where(F.col("tok") == "hot").count()
    assert per_gen >= 2500 // 64 + 1  # many fine blocks + >=1 coarse

    q = spark.createDataFrame([(9999, ["hot"])], "q_id bigint, toks array<string>")
    w = Window.partitionBy("q_id").orderBy(F.col("s_int").desc(), F.col("doc_id").asc())

    def top5(df):
        return [
            (r.doc_id, r.s_int)
            for r in df.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 5)
            .orderBy("rk")
            .collect()
        ]

    got = top5(bm25_topk(spark, adir, q, 5, min_docs=0))
    want = top5(bm25_scores(spark, adir, q))
    assert got == want and len(got) == 5
    assert all(d >= 5000 for d, _ in got)  # extension docs win


def test_full_compact_merges_postings_files_and_stays_neutral(spark, tmp_path):
    """merge_postings=True (the opt-in O(corpus) maintenance pass for
    long extension chains): content-identical probe results, postings
    collapse to one file per bucket (the default compact leaves one
    per extension per touched bucket), blocks rebuilt fine-grained."""
    import os

    from opencypher_datalayer_spark.operators import bm25_index as bm

    store = ArtifactStore(str(tmp_path))
    store.commit(KIND, ("m",), lambda t: write_bm25_index(_docs(spark, CORPUS), t))
    for i in range(5):
        extend_bm25_index(
            spark, store, KIND, ("m",), _docs(spark, [(300 + i, "quick extra doc")])
        )
    before = _probe(spark, store.current_dir(KIND, ("m",)))

    def files_per_bucket(vdir):
        counts = {}
        root = os.path.join(vdir, "postings")
        for dp, _, fs in os.walk(root):
            n = sum(1 for f in fs if f.endswith(".parquet"))
            if n and "bucket=" in dp:
                counts[dp.rsplit("bucket=", 1)[1]] = n
        return counts

    old = store.current_dir(KIND, ("m",))
    assert max(files_per_bucket(old).values()) > 1  # fragmented by extensions

    compact_bm25_index(spark, store, KIND, ("m",), merge_postings=True)
    new = store.current_dir(KIND, ("m",))
    assert generations(spark, new) == 1
    assert max(files_per_bucket(new).values()) == 1  # merged
    assert _probe(spark, new) == before  # content-neutral
    # blocks present and rebuilt (readable, covers the hot term)
    blocks = read_bm25_index(spark, new)[bm.BLOCKS]
    assert blocks.where(blocks.tok == "quick").count() >= 1


def test_xxh64_twin_matches_engine(spark, sf_dir):
    """The driver-side postings build's pure-Python xxhash64 must agree
    with Spark's for EVERY token it could ever bucket — differential
    over the real corpus vocabulary plus crafted shapes (every tail
    length class of the algorithm, multi-byte UTF-8, digits)."""
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators.bm25_index import _xxh64_py
    from opencypher_datalayer_spark.operators.textkit import tokens
    from opencypher_datalayer_spark.sources.tables import load_table

    vocab = [
        r.tok
        for r in load_table(spark, "documents", sf_dir)
        .select(F.explode(tokens(F.col("text"))).alias("tok"))
        .distinct()
        .collect()
    ]
    crafted = [
        "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
        "abcdefghi", "abcdefghijklmno", "abcdefghijklmnop",
        "x" * 31, "x" * 32, "x" * 33, "x" * 64, "x" * 65,
        "w3p7", "état", "übergröße", "数据引擎", "mixé数",
    ]
    probe = sorted(set(vocab) | set(crafted))
    got = {
        r.s: r.h
        for r in spark.createDataFrame([(s,) for s in probe], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    for s in probe:
        assert _xxh64_py(s.encode("utf-8")) == got[s], repr(s)


def test_driver_postings_build_equals_spark_write(spark, tmp_path, monkeypatch):
    """A fresh build with a caller-known count takes the driver-side
    postings path (one Arrow collect, pyarrow writes); the same corpus
    with the gate closed takes the distributed write. Both must yield
    identical read-back frames and probe scores — including under
    Java-\\s whitespace runs, multi-byte UTF-8 tokens, >32-byte tokens
    (the hash's striped path), and token-less docs."""
    from opencypher_datalayer_spark.operators import bm25_index as bm

    nasty = [
        (0, "alpha\tbeta\n\ngamma  delta\x0b epsilon\r"),
        (1, " leading and trailing "),
        (2, "état übergröße 数据 mixé数 zeta"),
        (3, "x" * 40 + " " + "x" * 40 + " plainword"),
        (4, ""),  # token-less
        (5, "alpha beta beta gamma gamma gamma"),
    ]
    monkeypatch.setattr(bm, "BM25_BLOCK", 2)  # multi-block fine blocks
    frames = {}
    for mode, cap in (("driver", bm.BM25_DRIVER_BUILD_MAX_DOCS), ("spark", -1)):
        monkeypatch.setattr(bm, "BM25_DRIVER_BUILD_MAX_DOCS", cap)
        store = ArtifactStore(str(tmp_path / mode))
        store.commit(
            KIND,
            ("n",),
            lambda t: write_bm25_index(_docs(spark, nasty), t, n_docs=len(nasty)),
        )
        adir = store.current_dir(KIND, ("n",))
        got = read_bm25_index(spark, adir)
        frames[mode] = {
            name: sorted(map(tuple, df.collect())) for name, df in got.items()
        }
        q = spark.createDataFrame(
            [(0, ["alpha", "gamma", "x" * 40, "数据"])],
            "q_id bigint, toks array<string>",
        )
        frames[mode]["probe"] = sorted(
            (r.q_id, r.doc_id, r.s_int)
            for r in bm25_scores(spark, adir, q).collect()
        )
    assert frames["driver"] == frames["spark"]
    assert any(frames["driver"]["probe"]), "probe must be non-vacuous"
