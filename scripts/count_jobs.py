"""Count Spark jobs (and stages) a registry query launches — a
noise-free proxy for fixed scheduling overhead in the streaming /
multi-job queries (guide §1: measure first; job count is deterministic
where wall-clock on a noisy host is not).

Usage: python scripts/count_jobs.py <query> [query ...]
"""

import os
import sys

sys.path.insert(0, ".")

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
from opencypher_datalayer_spark.session import get_spark


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="count_jobs")
    sc = spark.sparkContext
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()
    registry = all_queries(extended=True)
    tracker = sc.statusTracker()

    def max_job_id() -> int:
        ids = tracker.getJobIdsForGroup(None) or []
        return max(ids) if ids else -1

    for name in sys.argv[1:]:
        clear_memo_caches()
        before = max_job_id()
        registry[name].fn(spark, sf_dir).count()
        after = max_job_id()
        print(f"{name}: {after - before} jobs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
