#!/usr/bin/env python
"""Capture .explain('formatted') for registry queries into plans/r07/.

Usage: capture_plans.py TAG OUTDIR query [query ...]

Writes OUTDIR/<query>_<TAG>.txt with (a) the returned frame's formatted
plan and (b) every parquet-write plan the fixture executed while
building (captured via a DataFrameWriter hook) — the commit-path plans
are where this round's changes live; the returned frame of a CDC
fixture is just the table read.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1]
OUTDIR = sys.argv[2]
NAMES = sys.argv[3:]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

write_plans: list[str] = []


def install_write_hook():
    import pyspark.sql.readwriter as rw

    real = rw.DataFrameWriter.parquet

    def hooked(self, path, *a, **k):
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                self._df.explain("formatted")
            write_plans.append(
                f"--- write #{len(write_plans)} -> .../{os.path.basename(path)}\n"
                + buf.getvalue()
            )
        except Exception as exc:  # capture must never break the query
            write_plans.append(f"--- write plan capture failed: {exc}\n")
        return real(self, path, *a, **k)

    rw.DataFrameWriter.parquet = hooked


def main():
    from bench import _fresh_spark

    os.makedirs(OUTDIR, exist_ok=True)
    spark = _fresh_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    install_write_hook()
    from data_hub_ejp_xml_pipeline_spark.queries import QUERIES

    for name in NAMES:
        fn, _ = QUERIES[name]
        write_plans.clear()
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            final_plan = buf.getvalue()
        except Exception as exc:
            final_plan = f"QUERY FAILED: {exc}"
        out = os.path.join(OUTDIR, f"{name}_{TAG}.txt")
        with open(out, "w") as fh:
            fh.write(f"== {name} ({TAG}) — returned frame ==\n")
            fh.write(final_plan)
            if write_plans:
                fh.write(
                    f"\n== fixture parquet-write plans ({len(write_plans)}) ==\n"
                )
                fh.write("\n".join(write_plans))
        print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
