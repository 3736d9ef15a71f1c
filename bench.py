"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is timed to completion of an action that materializes every
result row (count on the final plan). Times include Catalyst planning —
that is the real per-query cost a user sees.

Each query runs REPEATS times and the MINIMUM is reported: single-shot
timings on a busy local[32] swing ±2× (round-2 saw g_triangle_count move
+104% with zero code change), which makes real regressions undetectable.
The min over 3 runs is the standard low-noise estimator of the query's
actual cost; the total is the sum of per-query mins.

Memoized frames (every cache registered with ``benchqueries.memo`` —
co-supply edges, session memos) are cleared before EVERY timed run, so
a repeat's min measures true recomputation — never a cache hit.
``cold_total`` (sum of first runs) is reported alongside the min total
for the fully-cold picture.

STANDING ARTIFACTS (r9): queries listed in ``ARTIFACT_BACKED`` derive
corpus-side frames from the content-addressed artifact store
(``operators.artifacts``), which intentionally SURVIVES memo clears —
amortizing the standing corpus across invocations is the design, not a
cache leak. The bench drops the relevant artifacts before repeat #1
only: ``runs[0]`` is the honest cold build+probe, later repeats are the
warm probe a pipeline pays per batch, and the reported per-query min is
therefore the PROBE number. ``artifact_queries`` records the
cold/probe split per query and ``artifact_builds`` the pure standing
build per artifact kind, so cross-round comparisons can reconstruct
either view.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
from opencypher_datalayer_spark.session import get_spark

# Headline set == the 50 driver-facing primary registry entries (the
# exact set CORRECTNESS_r{N}.json oracle-checks), resolved at runtime so
# the bench can never drift from the correctness gate again (round-4
# verdict #7: nine primaries had green correctness rows but no headline
# timing while their extended twins were timed instead).
HEADLINE: list[str] = list(all_queries().keys())

# The formerly-headlined extended twins stay timed as a secondary list
# (reported under "secondary_queries", excluded from the headline total)
# so round-over-round comparisons with BENCH_r{1..4} remain possible.
SECONDARY = [
    # demoted r7 (multiband LSH promoted per VERDICT r6 #6); timed here
    # so cross-round comparison continues
    "sim_lsh_candidate_pairs",
    # demoted r8 (exact-substring dedup promoted; q21 gates the
    # EXISTS/NOT-EXISTS family)
    "q22_idle_customers",
    # demoted r8 (streaming near-dup filter promoted; cy_match_filter
    # gates the scan+filter shape, ev_* gate the temporal semantics)
    "cy_temporal_filter",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "g_match_filter",
    "g_expand_collect",
    "g_neighborhood_agg",
    "text_fingerprint",
    "text_scrub",
    "ev_tumbling_window",
    "ev_funnel",
    "ev_gap_fill",
    # demoted r10 (sim_filtered_topk promoted; sim_topk_bruteforce gates
    # the full-scan top-k family) — timed here for cross-round diffs
    "sim_sq8_topk",
    # r9 registry entries value-oracled but unbenched until r10
    # (VERDICT r9 next #7): timed so regressions trip the artifact diff
    "dedup_ingest_loop",
    "st_stream_vector_ingest",
    # r10: hybrid retrieval (text_bm25_topk is primary/headline; the
    # fusion twin is timed here)
    "sim_hybrid_rrf",
    # r10: the composed keep/drop verdict (curation product)
    "text_clean_corpus",
    # r10: the composed pipeline streamed (quality -> near-dup ->
    # per-epoch BM25 index extension; own tempdir state, not the store)
    "st_stream_clean_ingest",
    # demoted r10 (text_bm25_topk promoted; the window rank-pick family
    # is gated by q_window_navigation) — timed for cross-round diffs
    "q_top_customers_per_nation",
    # demoted r12 (dedup_jaccard_collapsed promoted with its sentinel
    # slice; q1 gates the filtered scan+agg family) — timed here
    "q19_disjunctive",
]


# Hash-pluggable dedup queries, timed a second time in ENGINE mode
# (xxhash64 — what a library caller gets) so the hash-family speedup is
# visible in every round's bench artifact, not only in SCALE.md. The
# headline keeps oracle (md5) mode: that is what the driver
# value-checks.
ENGINE_MODE = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_pairs",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "st_stream_neardup",
]

# Queries backed by STANDING corpus artifacts (operators.artifacts,
# r9): the artifact store deliberately survives clear_memo_caches —
# amortizing corpus-derived frames across invocations is the point
# (VERDICT r8 'what's missing' #1). The bench makes the split
# first-class instead of letting it blur the timings: for each query
# below, the relevant artifact kinds are DROPPED before repeat #1 (so
# runs[0] is the honest cold build+probe) and kept for the remaining
# repeats (so the reported min is the warm PROBE — the steady state a
# pipeline actually pays per batch). Both numbers land in the artifact
# under "artifact_queries"; pure build cost per kind lands under
# "artifact_builds".
ARTIFACT_BACKED: dict[str, tuple[str, ...]] = {
    "dedup_incremental": ("ngram_corpus",),
    # r10: the batch self-join family probes the standing FULL-corpus
    # artifact (own kind — different content from the incremental split)
    "dedup_ngram_jaccard": ("ngram_corpus_full",),
    "dedup_ngram_containment": ("ngram_corpus_full",),
    "dedup_containment_collapsed": ("ngram_corpus_full", "minhash_sigs"),
    # r11: the trained codebook is its own tiny standing artifact (the
    # quantizer-only consumers stop re-training on memo-cold calls);
    # drop it with the index so runs[0] stays the honest full-training
    # cold number
    "sim_ivf_pruned_topk": ("ivf", "ivf_cbk"),
    "dedup_jaccard_collapsed": ("ngram_corpus_full", "minhash_sigs"),
    # r12: the pair stage probes the standing coded index (arank slice
    # + SQ8 candidate screen), so the index artifact is a dependency
    "dedup_embedding_clusters": ("ivf", "ivf_cbk"),
    "dedup_embedding_recall": ("ivf_cbk",),
    "dedup_minhash_lsh_pairs": ("minhash_sigs",),
    "dedup_clusters": ("minhash_sigs",),
    "dedup_minhash_error": ("minhash_sigs",),
    "dedup_minhash_signatures": ("minhash_sigs",),
    # r10: SimHash fingerprints are pure per-doc — standing artifact
    # like the MinHash signatures (extension exact, no compact)
    "dedup_simhash": ("simhash_fps",),
    "dedup_simhash_pairs": ("simhash_fps",),
    "dedup_substring_pairs": ("winnow_fps",),
    # r10: lexical retrieval probes the standing inverted index; the
    # hybrid fusion shares it (plus the exact vector scan, unmemoized)
    "text_bm25_topk": ("bm25_index",),
    "sim_hybrid_rrf": ("bm25_index",),
    "text_clean_corpus": ("minhash_sigs",),  # the cluster side's standing artifact
    "st_stream_neardup": (),  # own parquet state machinery, not the store
}


def _drop_artifacts(kinds: tuple[str, ...]) -> None:
    from opencypher_datalayer_spark.operators.artifacts import default_store

    store = default_store()
    for kind in kinds:
        store.drop(kind=kind)


def time_artifact_builds(spark, sf_dir: str) -> dict[str, float]:
    """Pure standing-artifact build cost per kind, from a dropped
    store (the once-per-corpus-version price a deployment pays)."""
    import opencypher_datalayer_spark.benchqueries.dedup as dd
    import opencypher_datalayer_spark.benchqueries.similarity as sim
    import opencypher_datalayer_spark.benchqueries.text as tx

    builders = {
        "ngram_corpus": lambda: dd.build_incremental_artifacts(
            spark, sf_dir, dd.ORACLE_HASH_FAMILY
        ),
        "ngram_corpus_full": lambda: dd.build_corpus_artifacts(
            spark, sf_dir, dd.ORACLE_HASH_FAMILY
        ),
        "minhash_sigs": lambda: dd._minhash_sigs(
            spark, sf_dir, dd.ORACLE_HASH_FAMILY
        ),
        # ivf_cbk first (drops the index too, so the timer is the pure
        # k-means training cost); the "ivf" build then reuses the fresh
        # codebook artifact, timing the assignment + partitioned write
        "ivf_cbk": lambda: (
            _drop_artifacts(("ivf",)),
            sim._ivf_codebook(spark, sf_dir),
        ),
        "ivf": lambda: sim.build_ivf_artifacts(spark, sf_dir),
        "simhash_fps": lambda: dd._simhash(spark, sf_dir, dd.ORACLE_HASH_FAMILY),
        "winnow_fps": lambda: dd._winnow_fps(spark, sf_dir),
        "bm25_index": lambda: tx.build_bm25_artifact(spark, sf_dir),
    }
    out: dict[str, float] = {}
    for kind, fn in builders.items():
        _drop_artifacts((kind,))
        clear_memo_caches()
        t0 = time.perf_counter()
        fn()
        out[kind] = round(time.perf_counter() - t0, 3)
    return out


def retime_in_fresh_session(name: str, timeout: int = 900) -> float:
    """Re-time one registry query in a FRESH JVM (subprocess running
    this script with SPARK_GRAFT_BENCH_ONLY) and return its min — the
    adjudicator for warm-harness artifacts (JIT cliffs, co-scheduling).
    Returns -1.0 when the subprocess fails. Used by the outlier
    auto-isolation pass and by SPARK_GRAFT_BENCH_FRESH (VERDICT r7 #7:
    sf10 inflection queries carry both the warm-harness and the
    fresh-session number systematically, not as prose footnotes)."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json") as tmp:
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_ONLY=name,
            SPARK_GRAFT_BENCH_SECONDARY="0",
            SPARK_GRAFT_BENCH_ISOLATE="0",
            SPARK_GRAFT_BENCH_FRESH="",
            SPARK_GRAFT_BENCH_OUT=tmp.name,
        )
        try:
            subprocess.run(
                [sys.executable, str(Path(__file__).resolve())],
                env=env, capture_output=True, timeout=timeout, check=True,
            )
            with open(tmp.name) as f:
                return json.load(f)["queries"][name]
        except (subprocess.SubprocessError, OSError, ValueError, KeyError):
            return -1.0


def divergent_repeats(
    runs_by: dict[str, list[float]], ratio: float = 2.0, abs_gap: float = 0.5
) -> list[str]:
    """Names whose WARM repeats (run #2 onward — run #1 legitimately
    carries planning/JIT, and for artifact-backed queries the cold
    build) diverge by more than ``ratio`` and ``abs_gap`` seconds
    between themselves. Steady-state repeats of the same plan should be
    flat; a 2x swing inside one harness run is the measurement smell
    the r8 sf10 stream timing exposed (run 2 at 2.2x run 1 with no
    code in between)."""
    flagged = []
    for name, runs in runs_by.items():
        warm = runs[1:]
        if len(warm) >= 2:
            lo, hi = min(warm), max(warm)
            if hi > lo * ratio and hi - lo > abs_gap:
                flagged.append(name)
    return sorted(flagged)


def isolate_regressions(
    timings: dict[str, float], prior: dict[str, float], max_n: int = 6
) -> dict[str, float]:
    """Outlier auto-isolation (VERDICT r6 'what's wrong' #1): any query
    whose min regressed >25% (and >0.3s absolute) vs the prior artifact
    is re-timed in a fresh session; both numbers land in the artifact so
    it adjudicates plan regression vs harness artifact itself."""
    flagged = sorted(
        (n for n, t in timings.items()
         if n in prior and t > prior[n] * 1.25 and t - prior[n] > 0.3),
        key=lambda n: prior[n] - timings[n],
    )[:max_n]
    return {name: retime_in_fresh_session(name) for name in flagged}


def _host_fingerprint() -> dict:
    import platform

    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    mem_kb = 0
    try:
        with open("/proc/meminfo") as f:
            mem_kb = int(f.readline().split()[1])
    except (OSError, ValueError, IndexError):
        pass
    return {
        "cpu_model": model,
        "n_cpus": os.cpu_count(),
        "mem_gib": round(mem_kb / (1 << 20), 1),
        "kernel": platform.release(),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    registry = all_queries(extended=True)

    # warm the JVM, parquet reader, and python workers once so per-query
    # times measure the queries, not session initialization
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    headline, secondary_names = HEADLINE, SECONDARY
    if only:
        wanted = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in wanted if n not in registry]
        if unknown:
            raise SystemExit(f"unknown queries in SPARK_GRAFT_BENCH_ONLY: {unknown}")
        headline, secondary_names = wanted, []

    def time_set(names: list[str]) -> tuple[dict[str, float], dict[str, list[float]]]:
        mins: dict[str, float] = {}
        runs_by: dict[str, list[float]] = {}
        for name in names:
            qd = registry[name]
            runs = []
            for r in range(repeats):
                # drop ALL registered memoized frames (co-supply edges,
                # session memos, ...) so every run pays recompute cost.
                # Standing artifacts are dropped only before repeat #1:
                # runs[0] = cold build+probe, later repeats = warm probe
                # (the steady state; see ARTIFACT_BACKED).
                if r == 0:
                    _drop_artifacts(ARTIFACT_BACKED.get(name, ()))
                clear_memo_caches()
                t0 = time.perf_counter()
                qd.fn(spark, sf_dir).count()
                runs.append(round(time.perf_counter() - t0, 3))
            runs_by[name] = runs
            mins[name] = min(runs)
        return mins, runs_by

    timings, all_runs = time_set(headline)
    secondary: dict[str, float] = {}
    secondary_runs: dict[str, list[float]] = {}
    if secondary_names and os.environ.get("SPARK_GRAFT_BENCH_SECONDARY", "1") != "0":
        secondary, secondary_runs = time_set(secondary_names)

    engine_mode: dict[str, float] = {}
    if not only and os.environ.get("SPARK_GRAFT_BENCH_SECONDARY", "1") != "0":
        import opencypher_datalayer_spark.benchqueries.dedup as dd

        for name in ENGINE_MODE:
            fn = getattr(dd, name)
            runs = []
            for r in range(repeats):
                if r == 0:
                    _drop_artifacts(ARTIFACT_BACKED.get(name, ()))
                clear_memo_caches()
                t0 = time.perf_counter()
                fn(spark, sf_dir, hash_family=dd.DEFAULT_HASH_FAMILY).count()
                runs.append(round(time.perf_counter() - t0, 3))
            engine_mode[name] = min(runs)

    # ANN quality alongside speed (VERDICT r6 #1): recall@5 of the
    # production IVF answer path and of the multiband LSH candidate
    # generator, at this run's scale — a perf win that silently trades
    # away recall shows up here the same round it happens.
    recall: dict[str, float] = {}
    if not only:
        from opencypher_datalayer_spark.benchqueries import similarity as _sim

        for key, fn in (
            ("ivf_answer", _sim.sim_ivf_recall),
            ("lsh_candidates", _sim.sim_ann_recall),
        ):
            rows = fn(spark, sf_dir).collect()
            recall[f"{key}_mean"] = round(sum(r.recall for r in rows) / len(rows), 4)
            recall[f"{key}_min"] = round(min(r.recall for r in rows), 4)
        recall["floor"] = _sim.RECALL_FLOOR
        recall["k"] = _sim.TOPK

    # Outlier auto-isolation (VERDICT r6 'what's wrong' #1): min-of-N
    # inside one warm JVM conflates JIT state and co-scheduling. Any
    # headline query whose min regressed >25% (and >0.3s absolute)
    # vs the previously committed artifact is re-timed in a FRESH
    # session (subprocess) and both numbers are recorded, so the
    # artifact itself adjudicates plan regression vs harness artifact.
    isolated: dict[str, float] = {}
    if not only and os.environ.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0":
        prior_path = os.environ.get(
            "SPARK_GRAFT_BENCH_PRIOR",
            str(Path(__file__).resolve().parent / "BENCH_full.json"),
        )
        try:
            with open(prior_path) as f:
                prior = json.load(f).get("queries", {})
        except (OSError, ValueError):
            prior = {}
        isolated = isolate_regressions(timings, prior)
        # Intra-run repeat divergence (VERDICT r8 'what's wrong' #2):
        # the sf10 streaming query's SECOND in-session run was 2.2x its
        # first and the cross-artifact trigger above never fired. A
        # repeat set that diverges >2x within one harness run is its
        # own measurement smell — re-time those in a fresh session too.
        for name in divergent_repeats(all_runs):
            if name not in isolated:
                isolated[name] = retime_in_fresh_session(name)

    # Fresh-session re-times requested explicitly (VERDICT r7 #7): the
    # sf10 artifact records warm-harness AND fresh-JVM numbers for its
    # inflection queries under a systematic key instead of prose.
    fresh: dict[str, float] = {}
    fresh_names = [
        n.strip()
        for n in os.environ.get("SPARK_GRAFT_BENCH_FRESH", "").split(",")
        if n.strip()
    ]
    for name in fresh_names:
        if name in timings:
            fresh[name] = retime_in_fresh_session(name, timeout=1800)

    # First-class build/probe split for artifact-backed queries
    # (VERDICT r8 'what's missing' #1): cold = repeat #1 after the
    # artifact drop (build+commit+probe), probe = min of the warm
    # repeats (the per-batch steady state); artifact_builds = pure
    # standing-build cost per kind.
    artifact_queries: dict[str, dict[str, float]] = {}
    # secondary-tier runs included (but never in cold_total, which is
    # the headline's): sim_hybrid_rrf / text_clean_corpus are
    # artifact-backed and live in SECONDARY
    runs_for_split = {**secondary_runs, **all_runs}
    for name, kinds in ARTIFACT_BACKED.items():
        if kinds and name in runs_for_split and len(runs_for_split[name]) > 1:
            artifact_queries[name] = {
                "cold": runs_for_split[name][0],
                "probe": min(runs_for_split[name][1:]),
            }
    artifact_builds: dict[str, float] = {}
    if not only and os.environ.get("SPARK_GRAFT_BENCH_SECONDARY", "1") != "0":
        artifact_builds = time_artifact_builds(spark, sf_dir)

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(r[0] for r in all_runs.values()), 3)
    import hashlib

    record = {
        "metric": "headline_query_total_runtime",
        "value": total,
        "unit": "sec",
        "cold_total": cold_total,
        "queries": timings,
        "secondary_queries": secondary,
        "engine_mode_queries": engine_mode,
        "artifact_queries": artifact_queries,
        "artifact_builds": artifact_builds,
        "recall": recall,
        "isolated": isolated,
        "fresh_session": fresh,
        "sf": float(sf),
        "n_queries": len(timings),
        # set identity: label + content hash of the sorted query names,
        # so cross-round total diffs can detect headline-set changes
        # machine-readably instead of silently comparing different sets
        "headline_set": f"primaries-{len(timings)}",
        "headline_hash": hashlib.sha256(
            ",".join(sorted(timings)).encode()
        ).hexdigest()[:12],
        "repeats": repeats,
        # host fingerprint (VERDICT r8 next #5): the r7->r8 comparison
        # was confounded by a mid-round host change that had to be
        # attributed by hand; every artifact now stamps enough to
        # detect that machine-readably.
        "host": _host_fingerprint(),
        "runs": all_runs,
    }
    line = json.dumps(record)
    # the stdout line is the driver's record, but a truncated pipe
    # capture loses queries (BENCH_r05 lost 4 of 50) — always persist
    # the full JSON to a file as well
    # BENCH_full.json is the canonical full-headline artifact; a partial
    # run (SPARK_GRAFT_BENCH_ONLY) must never clobber it — commit
    # f7f398c's sf10 single-query rehearsal overwrote the 50-query sf0.1
    # record that outlier isolation uses as its prior.
    default_name = "BENCH_full.json" if not only else "BENCH_partial.json"
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        str(Path(__file__).resolve().parent / default_name),
    )
    with open(out_path, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
