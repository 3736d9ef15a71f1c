"""Capture .explain("formatted") for every primary registry query.

Usage: python scripts/capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<name>_<suffix>.txt (suffix default "before") for each
query (default: all 50 primaries). Streaming queries execute eagerly
inside fn(); their captured plan is the final (checkpointed) frame,
which is recorded as such.
"""

import os
import sys

sys.path.insert(0, ".")

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.benchqueries.memo import clear_memo_caches
from opencypher_datalayer_spark.session import get_spark


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = sys.argv[3:] or None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    registry = all_queries()
    names = only or list(registry)
    for name in names:
        clear_memo_caches()
        spark.sparkContext.setJobDescription(f"plan:{name}")
        try:
            df = registry[name].fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            txt = f"ERROR capturing plan: {e!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name} ({len(txt)} chars)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
