"""Audit registry output types for driver-canonicalizer hazards.

The driver canonicalizes results via pandas: DuckDB ``.df()`` degrades
DECIMAL/HUGEINT to float64 while Spark ``toPandas()`` keeps ``Decimal``
objects, and list cells crash ``sort_values``. Any query whose FINAL
output contains such a column hash-fails even with identical values.

Usage: python scripts/audit_output_types.py [sf_dir]
Prints one line per hazard; exits non-zero if any found.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import types as T

from opencypher_datalayer_spark.benchqueries import all_queries
from opencypher_datalayer_spark.oracle import duck_connection
from opencypher_datalayer_spark.session import get_spark

SPARK_HAZARDS = (T.DecimalType, T.ArrayType, T.MapType, T.StructType)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit-output-types")
    con = duck_connection(sf_dir)
    n_bad = 0
    registry = all_queries()
    print(f"registry entries: {len(registry)}")
    for name, qd in registry.items():
        try:
            schema = qd.fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            n_bad += 1
            continue
        for f in schema.fields:
            if isinstance(f.dataType, SPARK_HAZARDS):
                print(f"{name}: spark col {f.name}: {f.dataType.simpleString()}")
                n_bad += 1
        if qd.oracle is None:
            continue
        try:
            desc = con.sql(f"DESCRIBE ({qd.oracle})").fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            n_bad += 1
            continue
        for col, typ, *_ in desc:
            tu = typ.upper()
            if "DECIMAL" in tu or "HUGEINT" in tu or "[]" in tu or "STRUCT" in tu:
                print(f"{name}: oracle col {col}: {typ}")
                n_bad += 1
    print(f"hazards: {n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
