#!/usr/bin/env python
"""Run EVERY registered query against its DuckDB oracle (the driver's
correctness gate, locally): prints one line per query and a final
summary; exit code 1 on any mismatch.

Usage: python scripts/correctness_sweep.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> int:
    from data_hub_ejp_xml_pipeline_spark.checker import (
        compare_query,
        duckdb_connection,
    )
    from data_hub_ejp_xml_pipeline_spark.queries import QUERIES
    from data_hub_ejp_xml_pipeline_spark.session import get_spark

    spark = get_spark(app_name="correctness-sweep", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb_connection(SF_DIR)
    bad = []
    for name, (fn, sql) in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, con, fn, sql, SF_DIR)
            ok = res["values_match"]
        except Exception as exc:  # noqa: BLE001 — the sweep must finish
            res, ok = {"err": str(exc)[:200]}, False
        status = "ok" if ok else "FAIL"
        print(f"{status:4} {name:32} {time.time() - t0:6.1f}s "
              f"{'' if ok else res}")
        if not ok:
            bad.append(name)
    print(f"\n{len(QUERIES) - len(bad)}/{len(QUERIES)} queries match")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
