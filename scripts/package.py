#!/usr/bin/env python
"""Build engine.zip for `spark-submit --py-files` (SURVEY.md §7 M7).

Usage:
    python scripts/package.py            # writes ./engine.zip
    spark-submit --py-files engine.zip --master yarn your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "data_hub_ejp_xml_pipeline_spark"


def build(out: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, "engine.zip")
    print(build(out))


if __name__ == "__main__":
    main()
