"""Distributed connected-components microbench past the 2M-edge
driver-union-find handover (SCALE.md "100x list" #3).

Near-dup graphs at any realistic corpus scale are far below the 2M-edge
threshold (sf10: ~256k pair edges from 500k docs), so the distributed
pointer-jumping loop cannot be exercised by the corpus benches — this
script synthesizes edge frames with the near-dup topology (many small
quasi-cliques; diameter ~2) plus a pathological long-chain component
(what pointer jumping exists for), at sizes straddling the handover.

Usage: python scripts/bench_cc.py [edge_counts ...]
Prints one JSON line per (n_edges, mode) with wall seconds.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from opencypher_datalayer_spark.operators.components import connected_components
from opencypher_datalayer_spark.session import get_spark


def edge_frame(spark, n_edges: int):
    """~n_edges edges: 90% in 5-node cliques (10 edges per clique —
    near-dup shape), 10% one long chain (pathological diameter)."""
    clique_edges = int(n_edges * 0.9)
    n_cliques = clique_edges // 10
    base = spark.range(n_cliques).select(F.col("id").alias("c"))
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cliques = base.select(
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("i"), F.lit(j).alias("j")) for i, j in pairs])
        ).alias("p"),
        "c",
    ).select(
        (F.col("c") * 5 + F.col("p.i")).alias("src"),
        (F.col("c") * 5 + F.col("p.j")).alias("dst"),
    )
    chain_n = n_edges - clique_edges
    offset = n_cliques * 5
    chain = spark.range(chain_n).select(
        (F.col("id") + offset).alias("src"), (F.col("id") + offset + 1).alias("dst")
    )
    return cliques.union(chain).repartition(32).localCheckpoint()


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000, 8_000_000]
    spark = get_spark(app_name="bench_cc")
    spark.range(1).count()
    for n in sizes:
        edges = edge_frame(spark, n)
        n_real = edges.count()
        for mode, thr in (("driver", 50_000_000), ("distributed", 0)):
            if mode == "driver" and n > 16_000_000:
                continue  # don't collect arbitrarily large frames
            t0 = time.perf_counter()
            out = connected_components(edges, driver_threshold=thr)
            n_comp = out.agg(F.countDistinct("comp")).collect()[0][0]
            dt = round(time.perf_counter() - t0, 2)
            print(
                json.dumps(
                    {"edges": n_real, "mode": mode, "sec": dt, "components": n_comp}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
