"""Custom stateful streaming operator: per-key high-water-mark tracking.

The engine core deliberately keeps per-key state in the target table
itself (SURVEY.md §2.9 — no ``mapGroupsWithState`` needed for the merge
path). This module shows the pattern for operators that DO need explicit
state — here a per-``doc_id`` high-water-mark monitor built on
``applyInPandasWithState``: it tracks the max LSN seen and counts
late/duplicate deliveries per key across microbatches (the streaming
analog of the reference's replayed-file accounting,
``dags/s3_xml_import_pipeline.py:149-170``).
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("high_water_lsn", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("late_or_duplicate", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_lsn", T.LongType()),
        T.StructField("seen", T.LongType()),
        T.StructField("late", T.LongType()),
    ]
)


def _update(
    key: Tuple[str], pdf_iter: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        max_lsn, seen, late = state.get
    else:
        max_lsn, seen, late = -1, 0, 0
    for pdf in pdf_iter:
        # nullable Int64: a NULL lsn must neither crash int(max()) on an
        # all-null group nor promote the column to float64 (which corrupts
        # LSNs above 2^53 — same hazard the merge kernel guards against)
        lsns = pdf["lsn"].astype("Int64").dropna()
        seen += len(pdf)
        if lsns.empty:
            continue
        # events at or below the current high-water mark are replays/late
        late += int((lsns <= max_lsn).sum())
        # intra-batch duplicates beyond the first occurrence
        late += int(lsns[lsns > max_lsn].duplicated().sum())
        batch_max = int(lsns.max())
        if batch_max > max_lsn:
            max_lsn = batch_max
    state.update((max_lsn, seen, late))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "high_water_lsn": [max_lsn],
            "events_seen": [seen],
            "late_or_duplicate": [late],
        }
    )


def high_water_mark_monitor(changelog_stream: DataFrame) -> DataFrame:
    """Attach the stateful monitor to a streaming changelog (update mode).

    Emits one row per key per microbatch with the running high-water LSN,
    total events seen, and the count of late/duplicate deliveries — state
    survives restarts via the query checkpoint.

    State bound: one entry PER DISTINCT KEY for the life of the query
    (``GroupStateTimeout.NoTimeout`` — a high-water mark is only
    meaningful if it is never forgotten). At billions-of-keys scale run
    the monitor on a keyspace you can afford to hold (e.g. per
    source_file or per key-prefix, not per document), or fold the check
    into the merge path, which already keeps max-LSN per key IN THE TABLE
    at zero extra state. This operator is the observability pattern, not
    a mandatory stage."""
    return (
        changelog_stream.select("doc_id", "lsn")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
