"""Hypothesis model of the BM25 kernel: on random corpora and queries,
the Spark scores must equal a pure-Python reference computation of the
pinned scoring point, and a split-build-plus-extension must equal the
full build (the additive-df exactness claim, fuzzed)."""

import math
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from opencypher_datalayer_spark.operators.artifacts import ArtifactStore
from opencypher_datalayer_spark.operators.bm25_index import (
    bm25_scores,
    bm25_topk,
    extend_bm25_index,
    write_bm25_index,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]

doc_strategy = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=7)
query_strategy = st.lists(
    st.sampled_from(VOCAB + ["novel"]), min_size=1, max_size=4, unique=True
)


def _python_bm25(corpus: list[str], qtoks: list[str]) -> dict[int, int]:
    docs = {i: t.split() for i, t in enumerate(corpus)}
    n = len(docs)
    sumdl = sum(len(v) for v in docs.values())
    if sumdl == 0:
        return {}
    avgdl = float(sumdl) / float(n)
    df: dict[str, int] = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out: dict[int, int] = {}
    for d, toks in docs.items():
        s = 0
        for t in set(qtoks):
            tf = toks.count(t)
            if not tf:
                continue
            idf = (n - df[t] + 0.5) / (df[t] + 0.5) + 1.0
            sat = (tf * (1.0 + 1.2)) / (
                tf + 1.2 * ((1.0 - 0.75) + 0.75 * (len(toks) / avgdl))
            )
            s += math.floor(idf * sat * 1e9)
        if s:
            out[d] = s
    return out


@settings(max_examples=4, deadline=None)
@given(corpus=corpus_strategy, qtoks=query_strategy)
def test_scores_match_python_model_and_extension_is_exact(spark, corpus, qtoks):
    store = ArtifactStore(tempfile.mkdtemp(prefix="bm25_prop_"))
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id bigint, text string"
    )
    store.commit("m", ("full",), lambda t: write_bm25_index(docs, t))
    q = spark.createDataFrame([(0, qtoks)], "q_id bigint, toks array<string>")

    def probe(adir):
        return {r.doc_id: r.s_int for r in bm25_scores(spark, adir, q).collect()}

    got = probe(store.current_dir("m", ("full",)))
    assert got == _python_bm25(corpus, qtoks)

    # split build + extension == full build (df/corpus deltas are exact)
    head = docs.where(f"doc_id < {len(corpus) - 1}")
    tail = docs.where(f"doc_id >= {len(corpus) - 1}")
    store.commit("m", ("split",), lambda t: write_bm25_index(head, t))
    extend_bm25_index(spark, store, "m", ("split",), tail)
    assert probe(store.current_dir("m", ("split",))) == got


@settings(max_examples=4, deadline=None)
@given(corpus=corpus_strategy, qtoks=query_strategy, k=st.integers(1, 4))
def test_maxscore_topk_matches_naive_ranking(spark, corpus, qtoks, k):
    """The MaxScore guarantee, fuzzed: bm25_topk's per-query ranking by
    (s_int DESC, doc_id ASC) has the same first-k rows as ranking the
    full bm25_scores output with self excluded — whatever terms the
    upper-bound skip classified non-essential."""
    store = ArtifactStore(tempfile.mkdtemp(prefix="bm25_ms_"))
    docs = spark.createDataFrame(list(enumerate(corpus)), "doc_id bigint, text string")
    store.commit("m", ("a",), lambda t: write_bm25_index(docs, t))
    adir = store.current_dir("m", ("a",))
    q = spark.createDataFrame([(0, qtoks)], "q_id bigint, toks array<string>")
    naive = _python_bm25(corpus, qtoks)
    naive.pop(0, None)  # self pair (q_id 0 is doc 0)
    want = sorted(naive.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got_rows = {
        r.doc_id: r.s_int for r in bm25_topk(spark, adir, q, k, min_docs=0).collect()
    }
    got = sorted(got_rows.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want
    # every returned candidate carries its EXACT full score
    for d, s in got_rows.items():
        assert naive[d] == s
