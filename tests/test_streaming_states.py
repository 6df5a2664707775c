"""Streaming wiring for the round-5 sidecar states: drive MergePipeline
with SCD2 history + secondary index + DLQ attached simultaneously under
ChangelogTailer with a mid-stream kill and checkpoint restart; every
durable artifact must converge to the crash-free run's. The per-module
tests pin each state's semantics; this pins the combined foreachBatch
wiring and the cross-state crash window (some states' epoch commits land
before the base merge's — replay must no-op exactly the committed ones)."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.streaming.tailer import ChangelogTailer

N_FILES = 6


@pytest.fixture()
def dirty_changelog_dir(tmp_path):
    from data_hub_ejp_xml_pipeline_spark.generator import write_changelog_files
    from tests.test_dlq import _dirty_pdf

    d = str(tmp_path / "changelog")
    write_changelog_files(_dirty_pdf(n_events=2_500, seed=41), d, N_FILES)
    return d


def _freeze(row):
    return tuple(tuple(v) if isinstance(v, list) else v for v in row)


def _history_rows(scd2):
    return {_freeze(r) for r in scd2.read_history().collect()}


def _index_rows(idx):
    return {tuple(r) for r in idx.postings.read().drop("_deleted").collect()}


def _dlq_rows(dlq):
    return {
        (r.reject_reason, r.epoch, r.lsn, r.doc_id, r.op)
        for r in dlq.read().collect()
    }


def _final_rows(pipe):
    return {_freeze(r) for r in pipe.final_state().collect()}


def test_streaming_all_states_crash_restart_converges(
    spark, tmp_path, dirty_changelog_dir
):
    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State
    from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import (
        SecondaryIndexState,
    )
    from data_hub_ejp_xml_pipeline_spark.schemas import CHANGELOG_SCHEMA, TARGET_SCHEMA
    from pyspark.sql import types as T

    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])

    def build(root: str, **tailer_kw):
        scd2 = Scd2State(spark, root + "/scd2", payload_schema=payload,
                         n_buckets=4)
        idx = SecondaryIndexState(spark, root + "/idx", index_col="source",
                                  n_buckets=4)
        dlq = DlqState(spark, root + "/dlq", payload_schema=CHANGELOG_SCHEMA,
                       n_buckets=4)
        pipe = MergePipeline(spark, root + "/tbl", n_buckets=4,
                             scd2_state=scd2, index_state=idx, dlq_state=dlq)
        return (scd2, idx, dlq, pipe), ChangelogTailer(spark, pipeline=pipe,
                                                       **tailer_kw)

    # crash-free reference run
    (scd2_r, idx_r, dlq_r, pipe_r), ref_tailer = build(str(tmp_path / "ref"))
    ref_tailer.run_to_completion(dirty_changelog_dir, str(tmp_path / "ck_ref"),
                                 max_files_per_trigger=1)

    # crashing run: kill after 2 epochs, restart from the SAME checkpoint
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ck_crash")
    _, crashing = build(crash_root, fail_after_batches=2)
    q = crashing.start(dirty_changelog_dir, ckpt, max_files_per_trigger=1)
    with pytest.raises(Exception):
        q.awaitTermination()
    (scd2_c, idx_c, dlq_c, pipe_c), resumed = build(crash_root)
    resumed.run_to_completion(dirty_changelog_dir, ckpt,
                              max_files_per_trigger=1)

    assert _final_rows(pipe_c) == _final_rows(pipe_r)
    assert _history_rows(scd2_c) == _history_rows(scd2_r)
    assert _index_rows(idx_c) == _index_rows(idx_r)
    assert _dlq_rows(dlq_c) == _dlq_rows(dlq_r)
    # the workload must actually exercise every artifact
    assert _dlq_rows(dlq_r), "dirty changelog must produce rejects"
    assert scd2_r.read_history().filter("NOT is_current").count() > 0, \
        "multi-epoch updates must close history versions"
    assert idx_r.postings.read().filter("tombstone").count() > 0, \
        "value churn must produce index tombstones"


# ---------------------------------------------------------------------
# round 6: the production epoch — multi-table routing × wire schema
# drift × wire DLQ × SCD2 × IVM composed on ONE tailer, under crash
# ---------------------------------------------------------------------

def _envelope(lsn, table, doc_id, etype, val, score=None, bad_op=False):
    import json

    payload = {"doc_id": doc_id, "etype": etype, "val": val}
    if score is not None:
        payload["score"] = score
    if payload["doc_id"] is None:
        del payload["doc_id"]  # to_json-style null-field drop
    op = "x" if bad_op else ("d" if etype == "error" else "u")
    env = {
        ("before" if op == "d" else "after"): payload,
        "op": op,
        "ts_ms": 1_700_000_000_000 + lsn,
        "source": {"lsn": lsn, "table": table},
    }
    return json.dumps(env)


DRIFT_AT = 400  # evens envelopes carry `score` on the wire from here on


def _kitchen_sink_files(tmp_path, n=600, n_files=6):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    chg = str(tmp_path / "chg")
    os.makedirs(chg)
    lines = []
    for lsn in range(1, n + 1):
        user = int(rng.integers(0, 80))
        table = "evens" if user % 2 == 0 else "odds"
        etype = "error" if lsn % 11 == 0 else f"t{user % 3}"
        doc_id = None if lsn % 37 == 0 else str(user)
        score = lsn * 3 if (table == "evens" and lsn >= DRIFT_AT
                            and etype != "error") else None
        lines.append(
            _envelope(lsn, table, doc_id, etype, round(lsn * 0.5, 2),
                      score=score, bad_op=(lsn % 53 == 0))
        )
    per = len(lines) // n_files + 1
    for i in range(n_files):
        path = f"{chg}/f{i:02d}.parquet"
        pq.write_table(
            pa.table({"value": lines[i * per:(i + 1) * per]}), path
        )
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return chg


def test_production_epoch_composition_crash_restart(spark, tmp_path):
    """Routing, mid-stream wire drift (auto-evolve), wire-level DLQ, SCD2
    on one table and IVM on the other — all attached to the same
    ChangelogTailer — killed after 2 epochs and resumed from the
    checkpoint: every table, every sidecar and the quarantine must
    converge to the crash-free run. This is where batch_id/ledger
    interactions bite: some states commit an epoch before the base merge
    does, and the drift re-detection must be deterministic on replay."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
    from data_hub_ejp_xml_pipeline_spark.plans.multi_table import MultiTablePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

    chg = _kitchen_sink_files(tmp_path)
    base = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    wire_schema = T.StructType([T.StructField("value", T.StringType())])
    dlq_payload = T.StructType(
        [T.StructField("tbl", T.StringType()), T.StructField("raw", T.StringType())]
    )

    def build(root):
        scd2 = Scd2State(spark, f"{root}/scd2", payload_schema=base,
                         n_buckets=2)
        ivm = IncrementalAggState(spark, f"{root}/ivm", group_col="etype",
                                  value_col="val")
        dlq = DlqState(spark, f"{root}/dlq", payload_schema=dlq_payload,
                       n_buckets=2)
        mt = MultiTablePipeline(
            spark, f"{root}/mt",
            schemas={"evens": base, "odds": base},
            n_buckets=2,
            auto_evolve=True,
            wire_dlq=dlq,
            pipeline_kwargs={
                "evens": {"scd2_state": scd2},
                "odds": {"ivm_state": ivm},
            },
        )
        return scd2, ivm, dlq, mt

    def tail(mt, ckpt, metrics, **kw):
        tailer = ChangelogTailer(spark, pipeline=mt, metrics_path=metrics, **kw)
        return tailer.start(chg, ckpt, schema=wire_schema,
                            max_files_per_trigger=1)

    # crash-free reference
    scd2_r, ivm_r, dlq_r, ref = build(str(tmp_path / "ref"))
    q = tail(ref, str(tmp_path / "ck_ref"), str(tmp_path / "m_ref.jsonl"))
    q.awaitTermination()

    # crashing run + resume from the same checkpoint
    crash_root = str(tmp_path / "crash")
    ckpt = str(tmp_path / "ck_crash")
    _, _, _, crashing = build(crash_root)
    q = tail(crashing, ckpt, str(tmp_path / "m_c1.jsonl"),
             fail_after_batches=2)
    with pytest.raises(Exception):
        q.awaitTermination()
    scd2_c, ivm_c, dlq_c, resumed = build(crash_root)
    q = tail(resumed, ckpt, str(tmp_path / "m_c2.jsonl"))
    q.awaitTermination()

    def rows(df):
        return {tuple(r) for r in df.collect()}

    for t in ("evens", "odds"):
        assert rows(resumed.final_state(t)) == rows(ref.final_state(t)), t
    assert rows(scd2_c.read_history()) == rows(scd2_r.read_history())
    assert rows(ivm_c.read_totals()) == rows(ivm_r.read_totals())
    assert rows(dlq_c.read()) == rows(dlq_r.read())

    # the workload must actually exercise every composed artifact
    evens = ref.final_state("evens")
    assert "score" in evens.columns, "wire drift must have evolved the table"
    assert evens.filter(F.col("score").isNotNull()).count() > 0
    assert evens.filter(F.col("score").isNull()).count() > 0, \
        "pre-drift rows must read NULL"
    reasons = {r.reject_reason for r in dlq_r.read().collect()}
    assert any("null key" in r for r in reasons)
    assert any("unknown op" in r for r in reasons)
    assert scd2_r.read_history().filter("NOT is_current").count() > 0
    # IVM totals equal an independent recompute over the replicated base
    recomputed = rows(
        ref.final_state("odds").groupBy("etype")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.round(F.sum("val"), 6).alias("total"))
    )
    got = rows(
        ivm_r.read_totals()
        .select("etype", "cnt", F.round("total", 6).alias("total"))
    )
    assert got == recomputed
    # routing-wide fsck covers every durable artifact the epoch touched —
    # incl. the resumed run's crash window
    chk = resumed.verify(deep=True)
    assert chk["ok"], chk
    assert set(chk["tables"]) == {"evens", "odds"}
    assert "wire_dlq_rejects" in chk
