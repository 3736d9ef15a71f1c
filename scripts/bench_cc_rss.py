"""Driver-RSS measurement for the connected-components driver path
(VERDICT r6 #2): collect N-edge frames through the Arrow driver path
and record peak RSS delta + wall time, so the driver/distributed
handover threshold is derived from a measured bytes-per-edge figure
against a memory budget — not a fixed edge count.

Usage: python scripts/bench_cc_rss.py [edge_counts ...]
Each size runs in a fresh subprocess so ru_maxrss (a high-water mark)
is not polluted by earlier sizes. Prints one JSON line per size.
"""

import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, ".")


def _child(n_edges: int) -> None:
    from pyspark.sql import functions as F

    from opencypher_datalayer_spark.operators import components
    from opencypher_datalayer_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from bench_cc import edge_frame

    spark = get_spark(app_name="cc_rss")
    edges = edge_frame(spark, n_edges)
    n_real = edges.count()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    t0 = time.perf_counter()
    # threshold counts SYMMETRIZED deduped edges (~2x the input frame)
    out = components.connected_components(edges, driver_threshold=2 * n_real + 1)
    n_out = out.count()
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    print(
        json.dumps(
            {
                "n_edges": n_real,
                "n_nodes": n_out,
                "wall_s": round(wall, 2),
                "rss_delta_bytes": rss1 - rss0,
                "bytes_per_edge": round((rss1 - rss0) / max(n_real, 1), 1),
                "rss_peak_bytes": rss1,
            }
        ),
        flush=True,
    )


def main() -> None:
    if os.environ.get("_CC_RSS_CHILD"):
        _child(int(os.environ["_CC_RSS_CHILD"]))
        return
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 4_000_000, 8_000_000]
    for n in sizes:
        env = dict(os.environ, _CC_RSS_CHILD=str(n))
        subprocess.run([sys.executable, __file__], env=env, check=True)


if __name__ == "__main__":
    main()
