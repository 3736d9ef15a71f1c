"""The bench outlier auto-isolation path (VERDICT r6 'what's wrong'
#1) had never actually fired in a committed artifact — VERDICT r7 #6
asks for a test that forces the trigger with a synthetic deflated prior
so the subprocess re-time path is known-working before a real
regression needs it."""

import os
import sys

sys.path.insert(0, "/root/repo")

import bench


def test_isolation_trigger_logic():
    """Pure trigger math: >25% AND >0.3s absolute, capped at max_n,
    worst-regression-first."""
    timings = {
        "a": 1.0,   # prior 0.5: +100%, +0.5s -> flagged
        "b": 0.5,   # prior 0.45: +11% -> not flagged
        "c": 0.55,  # prior 0.3: +83% but +0.25s absolute -> not flagged
        "d": 9.0,   # prior 2.0: flagged, worse than a
        "e": 4.0,   # no prior -> not flagged
    }
    prior = {"a": 0.5, "b": 0.45, "c": 0.3, "d": 2.0}
    calls = []
    orig = bench.retime_in_fresh_session
    bench.retime_in_fresh_session = lambda name, timeout=900: calls.append(name) or 0.1
    try:
        out = bench.isolate_regressions(timings, prior, max_n=1)
        assert calls == ["d"]  # worst absolute regression first, capped
        assert out == {"d": 0.1}
    finally:
        bench.retime_in_fresh_session = orig


def test_divergent_repeats_trigger():
    """Intra-run repeat divergence (VERDICT r8 'what's wrong' #2): warm
    repeats (run #2 onward) swinging >2x AND >0.5s flag the query; the
    first run (planning/JIT/artifact build) never participates."""
    runs = {
        "flat": [3.0, 1.0, 1.1],          # slow run1 is fine
        "diverge": [1.0, 1.0, 2.6],       # warm swing 2.6x, +1.6s -> flagged
        "small_abs": [0.2, 0.1, 0.3],     # 3x but only +0.2s -> not flagged
        "ratio_ok": [5.0, 4.0, 6.0],      # +2s but 1.5x -> not flagged
        "two_runs": [9.0, 1.0],           # only one warm repeat -> skip
    }
    assert bench.divergent_repeats(runs) == ["diverge"]


def test_artifact_backed_names_resolve():
    """Every ARTIFACT_BACKED query must exist in the registry and every
    kind must have a builder in time_artifact_builds' mapping — a
    renamed query or kind should fail here, not silently stop being
    timed."""
    from opencypher_datalayer_spark.benchqueries import all_queries

    registry = all_queries(extended=True)
    kinds = set()
    for name, ks in bench.ARTIFACT_BACKED.items():
        assert name in registry, name
        kinds.update(ks)
    assert kinds == {
        "ngram_corpus",
        "ngram_corpus_full",
        "ivf",
        "ivf_cbk",
        "minhash_sigs",
        "simhash_fps",
        "winnow_fps",
        "bm25_index",
    }
    # every kind the bench drops must also have a cold-build timer
    import inspect

    src = inspect.getsource(bench.time_artifact_builds)
    for kind in kinds:
        assert f'"{kind}"' in src, f"no builder timed for {kind}"


def test_forced_isolation_subprocess_retime(monkeypatch):
    """End-to-end: a deflated synthetic prior flags a real (cheap) query
    and the fresh-JVM subprocess returns a real positive timing."""
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_REPEATS", "1")
    out = bench.isolate_regressions(
        {"q_scalar_functions": 10.0}, {"q_scalar_functions": 0.001}
    )
    assert set(out) == {"q_scalar_functions"}
    assert out["q_scalar_functions"] > 0, "subprocess re-time failed"
