"""Run every registry query against its DuckDB oracle and report.

Usage: python scripts/selfcheck.py [sf_dir] [query ...]
"""

import sys

sys.path.insert(0, ".")

from opencypher_datalayer_spark.oracle import run_all
from opencypher_datalayer_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    spark = get_spark(app_name="selfcheck")
    results = run_all(spark, sf_dir, only=only)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(r)
    print(f"\n{n_ok}/{len(results)} ok at {sf_dir}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
