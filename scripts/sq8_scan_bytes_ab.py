"""SQ8 index scan-bytes A/B (SCALE.md §ivf-sq8-ab): exact per-column
parquet footprint of the standing IVF index's cell partitions, read
from the parquet footers — what a probe's stage-1 candidate scan pays
with int8 codes (code column) vs what the r10 float index paid (v +
nrm columns), plus the same ratio restricted to one probe's admitted
cells.

Usage: python scripts/sq8_scan_bytes_ab.py [sf_dir]
       (default /root/repo/.scaledata/sf10; builds the standing index
       if absent — run the bench first to reuse its artifact)
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq


def column_bytes(root: str) -> dict:
    """Exact compressed + uncompressed bytes per column across every
    data file under ``root`` (cell partition dirs included)."""
    out: dict = {}
    files = 0
    for dp, _, fs in os.walk(root):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            files += 1
            md = pq.ParquetFile(os.path.join(dp, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    # list columns report paths like v.list.element
                    top = c.path_in_schema.split(".")[0]
                    d = out.setdefault(top, {"compressed": 0, "uncompressed": 0})
                    d["compressed"] += c.total_compressed_size
                    d["uncompressed"] += c.total_uncompressed_size
    out["_files"] = files
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaledata/sf10"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from opencypher_datalayer_spark.benchqueries.similarity import (
        _ivf_codebook,
        _ivf_probe_pairs,
        build_ivf_artifacts,
    )
    from opencypher_datalayer_spark.operators.ivf_codebook import ivf_nprobe
    from opencypher_datalayer_spark.session import get_spark

    spark = get_spark()
    adir = build_ivf_artifacts(spark, sf_dir)
    vroot = os.path.join(adir, "vectors")

    whole = column_bytes(vroot)
    n, _, _ = _ivf_codebook(spark, sf_dir)
    pairs = _ivf_probe_pairs(spark, sf_dir, ivf_nprobe(n))
    admitted = sorted({c for _, c in pairs})
    adm = {"compressed": 0, "uncompressed": 0, "_files": 0}
    for c in admitted:
        p = os.path.join(vroot, f"cell={c}")
        if os.path.isdir(p):
            cb = column_bytes(p)
            for col in ("code", "v", "nrm", "vec_id"):
                if col in cb:
                    adm.setdefault(col, {"compressed": 0, "uncompressed": 0})
                    adm[col]["compressed"] += cb[col]["compressed"]
                    adm[col]["uncompressed"] += cb[col]["uncompressed"]
            adm["_files"] += cb["_files"]

    def ratio(scope: dict) -> dict:
        code = scope.get("code", {}).get("compressed", 0)
        raw = scope.get("v", {}).get("compressed", 0) + scope.get("nrm", {}).get(
            "compressed", 0
        )
        return {
            "code_bytes": code,
            "raw_bytes": raw,
            "raw_over_code": round(raw / code, 2) if code else None,
        }

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "index": adir,
                "whole_index": {
                    k: v for k, v in whole.items() if k in ("code", "v", "nrm", "vec_id")
                },
                "whole_ratio": ratio(whole),
                "admitted_cells": len(admitted),
                "admitted_files": adm["_files"],
                "admitted_ratio": ratio(adm),
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
