"""Stateful streaming operator: high-water-mark monitor state survives
across microbatches and restarts (applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd

from data_hub_ejp_xml_pipeline_spark.generator import write_changelog_files
from data_hub_ejp_xml_pipeline_spark.schemas import CHANGELOG_SCHEMA
from data_hub_ejp_xml_pipeline_spark.streaming.stateful import high_water_mark_monitor


def _mk_events(rows):
    import datetime as dt

    return pd.DataFrame(
        {
            "lsn": [r[0] for r in rows],
            "op": ["U"] * len(rows),
            "doc_id": [r[1] for r in rows],
            "tokens": [[1] for _ in rows],
            "n_tok": [1] * len(rows),
            "source": ["s"] * len(rows),
            "source_file": ["f"] * len(rows),
            "offset": list(range(len(rows))),
            "event_ts": [dt.datetime(2024, 1, 1)] * len(rows),
        }
    )


def _run(spark, d, ckpt, collected):
    stream = spark.readStream.schema(CHANGELOG_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    q = (
        high_water_mark_monitor(stream)
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_high_water_mark_state_across_batches(spark, tmp_path):
    d = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: a(1,3), b(2); batch 2: a(2 late, 3 dup, 5), b(7)
    write_changelog_files(_mk_events([(1, "a"), (3, "a"), (2, "b")]), d, 1)
    write_changelog_files(
        _mk_events([(2, "a"), (3, "a"), (5, "a"), (7, "b")]), d, 1, start_index=1,
        base_mtime=None,
    )
    out: list = []
    _run(spark, d, ckpt, out)
    final = {}
    for r in out:  # later updates overwrite earlier ones per key
        if r.doc_id not in final or r.events_seen > final[r.doc_id].events_seen:
            final[r.doc_id] = r
    assert final["a"].high_water_lsn == 5
    assert final["a"].events_seen == 5
    assert final["a"].late_or_duplicate == 2  # lsn 2 (late) + lsn 3 (dup)
    assert final["b"].high_water_lsn == 7
    assert final["b"].late_or_duplicate == 0

    # restart with a third batch: state restored from the same checkpoint
    write_changelog_files(
        _mk_events([(4, "a"), (6, "a")]), d, 1, start_index=2, base_mtime=None
    )
    out2: list = []
    _run(spark, d, ckpt, out2)
    a = next(r for r in out2 if r.doc_id == "a")
    assert a.events_seen == 7  # state carried across the restart
    assert a.high_water_lsn == 6
    assert a.late_or_duplicate == 3  # +1: lsn 4 < high-water 5
