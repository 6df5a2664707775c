"""Deployment-path pin: engine.zip really works via spark-submit --py-files.

The reference ships as an installed package inside an Airflow worker image
(`/root/reference/setup.py`, Docker entrypoint); our cluster analog is
`spark-submit --py-files engine.zip job.py` (SURVEY.md §7 M7). The unit
suite can't catch a packaging break — tests import the repo checkout
straight off PYTHONPATH — so this test runs a real spark-submit in a
scrubbed environment (no repo on PYTHONPATH, cwd outside the repo) and
asserts the job imports the package FROM THE ZIP, runs a grouped-map
pandas UDF (Python workers must zipimport the package too — cloudpickle
pickles module-level functions by reference), and commits a merge.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = '''\
import json, sys

import data_hub_ejp_xml_pipeline_spark as pkg
# prove we are running off the zip, not a checkout
assert "engine.zip" in (pkg.__file__ or ""), pkg.__file__

from data_hub_ejp_xml_pipeline_spark.generator import generate_changelog_df
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.session import get_spark

table_root = sys.argv[1]
spark = get_spark(app_name="submit-e2e", master="local[4]",
                  shuffle_partitions=8)
chg = generate_changelog_df(spark, 20000, events_per_file=20000)
# applyinpandas forces a grouped-map UDF whose closure references the
# package by module: Python workers must import it from the zip
pipe = MergePipeline(spark, table_root, n_buckets=4,
                     reduce_strategy="applyinpandas")
res = pipe.apply(chg, batch_id=1)
n = pipe.final_state().count()
print("SUBMITRESULT " + json.dumps({"final_rows": n,
                                    "merged_rows": res.rows_written}))
spark.stop()
'''


def test_engine_zip_runs_via_spark_submit(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import package as packager
    finally:
        sys.path.pop(0)
    zip_path = packager.build(str(tmp_path / "engine.zip"))

    job_path = tmp_path / "job.py"
    job_path.write_text(JOB)
    table_root = tmp_path / "table"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [spark_submit, "--py-files", zip_path, str(job_path), str(table_root)],
        cwd=str(tmp_path),  # repo checkout not importable from cwd either
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SUBMITRESULT ")]
    assert lines, proc.stdout[-2000:]
    result = json.loads(lines[-1][len("SUBMITRESULT "):])
    assert result["final_rows"] > 0
    assert result["merged_rows"] > 0
