"""Winnowing fingerprints (operators/winnowing.py) and the
exact-substring dedup query built on them.

The load-bearing property is the MOSS guarantee: every pair of docs
sharing a verbatim run of >= min_len chars MUST share a fingerprint
value — candidates are a superset, so the exact verify can never be
asked to rescue a lost pair. The randomized test plants shared runs at
exactly the threshold length into otherwise-random texts and asserts
the candidate join finds every planted pair; the query-level test pins
emit/no-emit at the L / L-1 boundary with a hand-computable n_shared.
"""

import random
import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from opencypher_datalayer_spark.benchqueries.dedup import SUBSTR_L
from opencypher_datalayer_spark.operators.winnowing import (
    fingerprint_values,
    k_for,
    window_for,
    winnow_fingerprints,
)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choices(string.ascii_lowercase + " ", k=n))


def test_fingerprints_deterministic_and_are_window_minima():
    rng = random.Random(7)
    text = _rand_text(rng, 200)
    k, w = k_for(40), window_for(40)
    a = fingerprint_values(text, w, k)
    b = fingerprint_values(text, w, k)
    assert np.array_equal(a, b)
    assert len(a) == len(np.unique(a))  # distinct values
    # density sanity: far fewer fingerprints than positions, but some
    m = len(text) - k + 1
    assert 0 < len(a) < m


def test_single_window_doc():
    # doc length exactly min_len: one window, one fingerprint
    rng = random.Random(3)
    text = _rand_text(rng, 40)
    v = fingerprint_values(text, window_for(40), k_for(40))
    assert len(v) == 1


def test_too_short_doc_yields_nothing():
    assert len(fingerprint_values("abc", window_for(40), k_for(40))) == 0


def test_guarantee_planted_runs_always_share_a_fingerprint(spark):
    """Plant the SAME min_len-char run into pairs of random docs at
    random offsets; every planted pair must appear in the fingerprint
    equi-join (the guarantee the candidate stage relies on)."""
    rng = random.Random(42)
    L = 40
    rows, expected = [], set()
    doc_id = 0
    for trial in range(30):
        run = _rand_text(rng, L)  # exactly threshold length
        pair = []
        for _ in range(2):
            n_pre = rng.randrange(0, 150)
            n_post = rng.randrange(0, 150)
            text = _rand_text(rng, n_pre) + run + _rand_text(rng, n_post)
            rows.append((doc_id, text))
            pair.append(doc_id)
            doc_id += 1
        expected.add(tuple(sorted(pair)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(docs, min_len=L)
    fa = fps.select(F.col("doc_id").alias("a"), "fp")
    fb = fps.select(F.col("doc_id").alias("b"), "fp")
    cand = {
        (r.a, r.b)
        for r in fa.join(fb, "fp").where(F.col("a") < F.col("b")).distinct().collect()
    }
    missing = expected - cand
    assert not missing, f"guarantee violated for {missing}"


def test_query_boundary_exact_vs_one_short(spark, tmp_path):
    """dedup_substring_pairs emits a pair sharing exactly SUBSTR_L chars
    (with the right n_shared) and drops a pair sharing SUBSTR_L-1."""
    import pandas as pd

    from opencypher_datalayer_spark.benchqueries.dedup import dedup_substring_pairs

    rng = random.Random(11)
    L = SUBSTR_L
    shared = _rand_text(rng, L)
    # docs 1/2 share exactly L chars (distinct surroundings); docs 3/4
    # share only L-1; doc 5 is unrelated filler
    rows = [
        (1, _rand_text(rng, 80) + shared + _rand_text(rng, 80)),
        (2, _rand_text(rng, 60) + shared + _rand_text(rng, 100)),
        (3, _rand_text(rng, 80) + shared[1:] + _rand_text(rng, 80)),
        (4, _rand_text(rng, 90) + shared[1:] + _rand_text(rng, 70)),
        (5, _rand_text(rng, 200)),
    ]
    sf_dir = str(tmp_path)
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        f"{sf_dir}/documents.parquet"
    )
    out = {(r.doc_a, r.doc_b): r.n_shared for r in dedup_substring_pairs(spark, sf_dir).collect()}
    assert (1, 2) in out
    assert (3, 4) not in out
    # an exactly-L shared run contributes exactly ONE shared L-gram
    # (surroundings random => no accidental extras with overwhelming
    # probability at this seed, asserted exactly)
    assert out[(1, 2)] == 1


def test_k_for_operating_points():
    assert k_for(40) == 32 and window_for(40) == 9
    # longer targets keep k capped and spend length on the window
    assert k_for(100) == 32 and window_for(100) == 69
    with pytest.raises(ValueError):
        k_for(8)
