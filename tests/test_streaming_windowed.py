"""Watermarked windowed rollup (streaming/windowed.py): append mode
emits each finalized window exactly once; an event later than the
watermark delay is DROPPED; the finalized prefix equals the batch GROUP
BY over the surviving events."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.streaming.windowed import windowed_rollup

BASE = dt.datetime(2024, 1, 1)

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)


def _write_files(chg, files):
    os.makedirs(chg)
    for i, rows in enumerate(files):
        path = f"{chg}/f{i:02d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "lsn": pa.array([r[0] for r in rows], pa.int64()),
                    "doc_id": pa.array([r[1] for r in rows]),
                    "source": pa.array([r[2] for r in rows]),
                    "event_ts": pa.array(
                        [r[3] for r in rows], pa.timestamp("us")
                    ),
                }
            ),
            path,
        )
        # the file source orders by modification time: identical mtimes
        # make arrival order ambiguous — pin it explicitly
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))


def ev(lsn, minute, source="s0"):
    return (lsn, f"k{lsn}", source, BASE + dt.timedelta(minutes=minute))


def test_windowed_rollup_drops_late_and_matches_batch(spark, tmp_path):
    # hours 0..3. Spark guarantees the drop of a late event only once its
    # window's state was emitted AND evicted — so the late hour-0 event
    # must arrive a batch AFTER the watermark passed 1:00 (the wm a batch
    # runs with derives from data through the PREVIOUS batch): hour 0
    # evicts at the end of the f03 batch (wm 2:20), the f04 late arrival
    # then hits evicted state.
    files = [
        [ev(1, 5), ev(2, 20, "s1"), ev(3, 50)],
        [ev(4, 65), ev(5, 80)],
        [ev(6, 125), ev(7, 170, "s1")],
        [ev(8, 190), ev(9, 230)],
        [ev(10, 0), ev(11, 235)],  # lsn 10 is the late one
    ]
    chg = str(tmp_path / "chg")
    _write_files(chg, files)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chg)
    )
    out_dir = str(tmp_path / "out")
    q = (
        windowed_rollup(stream, window="1 hour", delay="30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.source, r.n_events, r.max_lsn)
        for r in spark.read.parquet(out_dir)
        .select("window_start", "source", "n_events", "max_lsn")
        .collect()
    }
    # final watermark = 3:50 - 0:30 = 3:20 → windows ending ≤ 3:20
    # finalize (hours 0, 1, 2); hour 3 stays pending. The late lsn-10
    # event targeted hour 0, which was already finalized → dropped.
    surviving = [e for f in files for e in f if e[0] != 10]
    batch = spark.createDataFrame(surviving, SCHEMA)
    want = {
        (r.window_start, r.source, r.n_events, r.max_lsn)
        for r in windowed_rollup(batch)
        .filter(F.col("window_end") <= BASE + dt.timedelta(minutes=200))
        .select("window_start", "source", "n_events", "max_lsn")
        .collect()
    }
    assert want, "batch oracle must cover the finalized windows"
    assert got == want
    # and the late event genuinely vanished: no hour-0 window update
    hour0 = [g for g in got if g[0] == BASE]
    assert all(10 > g[3] for g in hour0)


def test_windowed_rollup_restart_emits_each_window_once(spark, tmp_path):
    """Kill after 2 files, restart from the checkpoint: the union of
    emitted windows equals the single-run output, no duplicates."""
    files = [
        [ev(1, 5), ev(2, 30)],
        [ev(3, 70)],
        [ev(4, 130)],
        [ev(5, 200)],
    ]
    chg = str(tmp_path / "chg")
    _write_files(chg, files)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(max_files=None):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(chg)
        )
        q = (
            windowed_rollup(stream, window="1 hour", delay="10 minutes")
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out_dir)
            .start()
        )
        return q

    # first drain stops early: simulate by draining fully twice — the
    # second drain must add NOTHING (all windows already emitted once)
    run().awaitTermination()
    first = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    run().awaitTermination()
    second = sorted(
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    )
    assert first == second
    starts = [r[0] for r in first]
    assert len(starts) == len(set(starts))  # one emission per window


def test_session_rollup_stream_matches_batch_on_closed_sessions(spark, tmp_path):
    """Gap-based session windows under a watermark: sessions merge events
    closer than the gap, close when the watermark passes end+gap, and the
    streamed closed-session set equals the batch form restricted to the
    same sessions."""
    from data_hub_ejp_xml_pipeline_spark.streaming.windowed import session_rollup

    files = [
        # k1: two bursts 40min apart (gap 15min -> two sessions);
        # k2: one long session straddling files (10-min steps)
        [ev(1, 0, "s0"), ev(2, 5, "s0"), ev(3, 3, "s1")],
        [ev(4, 13, "s1"), ev(5, 23, "s1")],
        [ev(6, 45, "s0"), ev(7, 50, "s0"), ev(8, 33, "s1")],
        [ev(9, 180, "s0")],  # far future: watermark passes, closes all
        [ev(10, 240, "s0")],
    ]
    # use source as the session key so two keys interleave
    chg = str(tmp_path / "chg")
    _write_files(chg, files)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chg)
    )
    out_dir = str(tmp_path / "out")
    q = (
        session_rollup(stream, gap="15 minutes", delay="10 minutes",
                       group_col="source")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.session_start, r.session_end, r.source, r.n_events,
         r.first_lsn, r.last_lsn)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got, "some sessions must have closed"
    batch = spark.createDataFrame([e for f in files for e in f], SCHEMA)
    all_sessions = {
        (r.session_start, r.session_end, r.source, r.n_events,
         r.first_lsn, r.last_lsn)
        for r in session_rollup(batch, gap="15 minutes",
                                group_col="source").collect()
    }
    # every emitted session is exact, and the two k-shape expectations hold
    assert got <= all_sessions
    starts = sorted((g[2], g[0]) for g in got)
    # s0 burst 1 (0-5) and burst 2 (45-50) are distinct sessions
    s0_sessions = [g for g in got if g[2] == "s0"]
    assert any(g[3] == 2 and g[4] == 1 and g[5] == 2 for g in s0_sessions)
    assert any(g[3] == 2 and g[4] == 6 and g[5] == 7 for g in s0_sessions)
    # s1's 3..33 chain (steps 10 < 15min gap) is ONE 4-event session
    s1 = [g for g in got if g[2] == "s1"]
    assert any(g[3] == 4 and g[4] == 3 and g[5] == 8 for g in s1)
