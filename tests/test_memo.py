"""The shared memo-cache discipline (``benchqueries.memo``): every
registered cache is cleared by ``clear_memo_caches`` (what bench.py
calls between timed runs), and the co-supply edge memo invalidates when
the lineitem parquet is regenerated in the same session."""

import os

import pandas as pd

from opencypher_datalayer_spark.benchqueries import dedup, graphalgo, memo

SRC = "/root/testdata/sf0.001"


def _write_lineitem(sf_dir: str, rows: list[tuple[int, int]]) -> None:
    pd.DataFrame(
        {
            "l_orderkey": [r[0] for r in rows],
            "l_suppkey": [r[1] for r in rows],
        }
    ).to_parquet(os.path.join(sf_dir, "lineitem.parquet"))


def test_clear_memo_caches_covers_all_registered(spark, tmp_path):
    sf = str(tmp_path)
    _write_lineitem(sf, [(o, s) for o in range(1, 6) for s in (1, 2)])
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["the quick brown fox jumps over the lazy dog " * 3],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": [44 * 3],
        }
    ).to_parquet(os.path.join(sf_dir := sf, "documents.parquet"))

    sigs = dedup._minhash_sigs(spark, sf_dir)
    edges = graphalgo._co_supply_edges(spark, sf_dir)
    memo.clear_memo_caches()
    assert dedup._minhash_sigs(spark, sf_dir) is not sigs
    assert graphalgo._co_supply_edges(spark, sf_dir) is not edges


def test_co_edges_cache_invalidates_on_data_change(spark, tmp_path):
    sf = str(tmp_path)
    # suppliers 1 and 2 share 5 distinct orders => support 5 => one edge
    _write_lineitem(sf, [(o, s) for o in range(1, 6) for s in (1, 2)])
    first = graphalgo._co_supply_edges(spark, sf).collect()
    assert len(first) == 1
    # regenerate in place (same path): expect fresh edges, not the memo
    _write_lineitem(sf, [(o, s) for o in range(1, 6) for s in (3, 4)])
    second = graphalgo._co_supply_edges(spark, sf).collect()
    assert first != second
    # unchanged data hits the cache (same object back)
    assert graphalgo._co_supply_edges(spark, sf) is graphalgo._co_supply_edges(spark, sf)
