#!/usr/bin/env python
"""Run EVERY registered query against its DuckDB oracle (the driver's
correctness gate, locally): prints one line per query and a final
summary; exit code 1 on any mismatch.

Usage: python scripts/correctness_sweep.py [sf_dir] [--record out.json]
           [only_query ...]

``--record`` writes the session's closing-gate record
(CORRECTNESS_SELF_r{N}.json shape: per-query status+sec, totals, ts) —
run it AFTER the session's last code commit so the recorded timestamp
postdates everything it vouches for.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_argv = sys.argv[1:]
RECORD = None
if "--record" in _argv:
    i = _argv.index("--record")
    RECORD = _argv[i + 1]
    _argv = _argv[:i] + _argv[i + 2:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.01"
ONLY = set(_argv[1:])


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
    record: dict = {}
    for name, (fn, sql) in QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            res = compare_query(spark, con, fn, sql, SF_DIR)
            ok = res["values_match"]
        except Exception as exc:  # noqa: BLE001 — the sweep must finish
            res, ok = {"err": str(exc)[:200]}, False
        sec = time.time() - t0
        status = "ok" if ok else "FAIL"
        record[name] = {"status": status, "sec": round(sec, 1)}
        if not ok:
            record[name]["detail"] = {
                k: v for k, v in res.items() if not hasattr(v, "collect")
            }
        print(f"{status:4} {name:32} {sec:6.1f}s {'' if ok else res}")
        if not ok:
            bad.append(name)
    print(f"\n{len(record) - len(bad)}/{len(record)} queries match")
    if RECORD is not None:
        with open(RECORD, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "gate": "scripts/correctness_sweep.py (same compare as "
                            "the driver: rows+schema+value-hash vs DuckDB "
                            "oracle)",
                    "total": len(record),
                    "ok": len(record) - len(bad),
                    "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                    "queries": record,
                },
                fh,
                indent=1,
            )
        print(f"record written: {RECORD}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
