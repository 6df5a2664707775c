"""Watermarked event-time windows over the changelog stream.

The reference has no event-time windows (SURVEY §2.9: consumers read
microbatch boundaries); a 100 TB tail still wants per-window rollups —
events/hour per source, lag percentiles — computed IN the stream with
bounded state, not by rescanning the table. Structured Streaming's
watermark is the engine-native answer:

* ``withWatermark(event_time, delay)`` bounds how late an event may
  arrive; window state older than the watermark is evicted, so state is
  O(active windows), never O(history).
* Append output mode emits a window exactly once — when the watermark
  passes its end (finalized, immutable). That makes the sink an APPEND
  of closed windows: exactly-once rides the same ``foreachBatch`` +
  ledgered ``SnapshotTable.append`` as every other sink. Events later
  than the delay are DROPPED by Spark's state eviction (the documented
  trade — size the delay to the source's lateness bound, same contract
  as ``plans/maintenance.py``'s vacuum watermark).

Trailing windows that the final watermark never passes stay pending
(classic availableNow drain semantics): a bounded replay emits the
finalized prefix only. That is correct, not lossy — the next drain (or a
closing heartbeat event) finalizes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_rollup(
    stream: DataFrame,
    gap: str = "30 minutes",
    delay: str = "30 minutes",
    event_time_col: str = "event_ts",
    group_col: str = "doc_id",
) -> DataFrame:
    """Event-time SESSION windows (gap-based, the hard case tumbling
    can't express): per key, events closer than ``gap`` merge into one
    session; the session closes when the watermark passes last_event +
    gap. Spark's native ``session_window`` keeps state per OPEN session
    only — O(active keys), never O(history) — and append mode emits each
    closed session exactly once. Works on a batch frame too (same
    expression; the batch form is what ``q_sessionize``'s SQL oracle
    family pins)."""
    grouped = (
        stream.withWatermark(event_time_col, delay)
        if stream.isStreaming
        else stream
    )
    return (
        grouped.groupBy(
            F.session_window(F.col(event_time_col), gap).alias("s"),
            F.col(group_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("lsn").alias("first_lsn"),
            F.max("lsn").alias("last_lsn"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            group_col,
            "n_events",
            "first_lsn",
            "last_lsn",
        )
    )


def windowed_rollup(
    stream: DataFrame,
    window: str = "1 hour",
    delay: str = "30 minutes",
    event_time_col: str = "event_ts",
    group_col: str = "source",
) -> DataFrame:
    """Event-time tumbling rollup with bounded lateness: counts, value
    reach (max lsn) and distinct keys per (window, group). Works on a
    batch frame too (same plan, no watermark state) — the tests pin
    stream == batch on the finalized prefix."""
    grouped = (
        stream.withWatermark(event_time_col, delay)
        if stream.isStreaming
        else stream
    )
    return (
        grouped.groupBy(
            F.window(F.col(event_time_col), window).alias("w"),
            F.col(group_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.max("lsn").alias("max_lsn"),
            F.approx_count_distinct("doc_id").alias("approx_keys"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
            "max_lsn",
            "approx_keys",
        )
    )
