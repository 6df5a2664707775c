"""Streaming dedup-on-ingest: watermarked exact deduplication.

The batch dedup family (``operators.dedup``) removes duplicates from data
at rest; a training-ingest pipeline also wants duplicates dropped AS THEY
ARRIVE — re-delivered files, producer retries, crawler overlap. Spark's
native shape for this is ``dropDuplicatesWithinWatermark``: state keeps
one entry per key until the event-time watermark passes, so memory is
bounded by the duplicate-arrival horizon instead of the stream's history
(plain ``dropDuplicates`` on a stream would keep ALL keys forever — the
100 TB anti-pattern).

The changelog tailer does NOT need this (the LSN-guarded merge is already
replay-idempotent); it exists for append-only ingest paths (raw document
streams) where there is no keyed merge downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop rows whose ``keys`` were already seen within the watermark
    horizon. State is evicted once event time passes ``delay`` — bounded
    by arrival skew, not stream length."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
