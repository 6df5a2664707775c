#!/usr/bin/env python
"""Build a larger-SF smoke dataset by unioning shifted copies of an
existing testdata dir (default: 4x sf0.1 -> /tmp/sf0.4up).

Fact tables (events, orders, lineitem) get their integer keys shifted
per copy so cardinalities scale like a real larger SF; dimension tables
are copied as-is (region/nation stay fixed at every TPC-H SF anyway).
This is NOT oracle data — it exists solely to smoke the frozen
``bench.py`` at a larger scale factor (the driver's round-end
measurement may use one) and confirm the round's optimizations hold
beyond 600k-row tables.

Usage: python scripts/upsample_testdata.py [src_dir] [factor] [out_dir]
"""
from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf0.4up"

# per-table integer key columns to shift by copy_index * (max+1)
SHIFT_COLS = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation", "supplier", "part"]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name in COPY_AS_IS:
        src = f"{SRC}/{name}.parquet"
        if os.path.exists(src):
            shutil.copy(src, f"{OUT}/{name}.parquet")
            print(f"copied {name}")
    for name, cols in SHIFT_COLS.items():
        src = f"{SRC}/{name}.parquet"
        if not os.path.exists(src):
            continue
        desc = con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        all_cols = [r[0] for r in desc]
        bounds = {
            c: con.sql(f"SELECT max({c}) + 1 FROM '{src}'").fetchone()[0]
            for c in cols
        }
        selects = []
        for k in range(FACTOR):
            exprs = []
            for c in all_cols:
                if c in cols:
                    exprs.append(f"{c} + {k * bounds[c]} AS {c}")
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM '{src}'")
        union = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({union}) TO '{OUT}/{name}.parquet' "
            "(FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}.parquet'").fetchone()[0]
        print(f"upsampled {name}: {n} rows (x{FACTOR})")


if __name__ == "__main__":
    main()
