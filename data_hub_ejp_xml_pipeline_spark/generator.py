"""Deterministic synthetic changelog generators (SURVEY.md §7 M0).

Mirrors the reference's test strategy of building synthetic inputs in code
and asserting golden outputs (reference ``tests/unit_test/utils/
dict_to_xml.py:33-60``, ``tests/unit_test/formats/*``), generalized to the
north-rule changelog shape (FIXTURES.md §1):

* duplicate/replayed events — the reference replays whole files after a
  crash-before-state-commit (``dags/s3_xml_import_pipeline.py:149-170``);
* out-of-order arrivals within a microbatch;
* hot-key skew (a few doc_ids carry ~30% of events);
* deletes of existing and never-inserted keys; updates to never-inserted
  keys (upsert).

Two generators:

* :func:`generate_changelog_pandas` — small-scale, numpy-seeded, used by
  tests together with the trivially-correct pandas oracle.
* :func:`generate_changelog_df` — distributed, pure DataFrame expressions
  (``spark.range`` + ``xxhash64``), used by the benchmark at millions of
  events; generation itself scales linearly with executors and never
  touches the driver.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.schemas import CHANGELOG_SCHEMA

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
_VOCAB = 50257


def generate_changelog_pandas(
    n_events: int = 10_000,
    n_docs: int | None = None,
    seed: int = 42,
    hot_fraction: float = 0.3,
    n_hot: int | None = None,
    replay_fraction: float = 0.02,
    delete_fraction: float = 0.05,
    phantom_fraction: float = 0.03,
    avg_tokens: int = 24,
    events_per_file: int = 500,
    shuffle_window: int = 400,
) -> pd.DataFrame:
    """Seed-fixed changelog as a pandas DataFrame (test scale)."""
    rng = np.random.default_rng(seed)
    n_docs = n_docs or max(8, n_events // 4)
    n_hot = n_hot or max(1, n_docs // 100)

    lsn = np.arange(1, n_events + 1, dtype=np.int64)
    hot = rng.random(n_events) < hot_fraction
    doc_idx = np.where(
        hot,
        rng.integers(0, n_hot, n_events),
        rng.integers(0, n_docs, n_events),
    )
    doc_id = np.array([f"doc-{i:08d}" for i in doc_idx])

    op = np.where(rng.random(n_events) < delete_fraction, "D", "U")
    # first occurrence of each doc becomes 'I' unless it is a "phantom"
    # (update/delete to a never-inserted key — upsert semantics)
    first_mask = ~pd.Series(doc_id).duplicated().values
    keep_phantom = rng.random(n_events) < phantom_fraction
    op = np.where(first_mask & ~keep_phantom & (op != "D"), "I", op)

    lengths = rng.integers(4, max(5, 2 * avg_tokens - 4), n_events)
    tokens: list[list[int] | None] = [
        None if op[i] == "D" else rng.integers(0, _VOCAB, lengths[i]).astype(np.int32).tolist()
        for i in range(n_events)
    ]
    n_tok = np.array([len(t) if t is not None else 0 for t in tokens], dtype=np.int32)
    n_tok_col = [int(n_tok[i]) if tokens[i] is not None else None for i in range(n_events)]

    source = np.array([f"src{i % 5}" for i in doc_idx])
    file_no = (lsn - 1) // events_per_file
    source_file = np.array([f"changelog-{f:06d}.zip" for f in file_no])
    offset = ((lsn - 1) % events_per_file).astype(np.int64)
    event_ts = [_EPOCH + dt.timedelta(seconds=int(x)) for x in lsn]

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": n_tok_col,
            "source": source,
            "source_file": source_file,
            "offset": offset,
            "event_ts": event_ts,
        }
    )

    # replayed events: re-emit identical full-row images later in the stream
    n_replay = int(n_events * replay_fraction)
    if n_replay:
        replay_idx = rng.choice(n_events, n_replay, replace=False)
        df = pd.concat([df, df.iloc[replay_idx]], ignore_index=True)

    # out-of-order arrivals: shuffle within windows so file order != lsn order
    order = np.arange(len(df))
    for start in range(0, len(df), shuffle_window):
        seg = order[start : start + shuffle_window]
        rng.shuffle(seg)
    return df.iloc[order].reset_index(drop=True)


def spark_changelog_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas changelog → Spark DataFrame with the canonical schema."""
    return spark.createDataFrame(pdf, schema=CHANGELOG_SCHEMA)


def changelog_arrow_schema():
    """Arrow schema matching CHANGELOG_SCHEMA (tokens as list<int32>)."""
    import pyarrow as pa

    return pa.schema(
        [
            ("lsn", pa.int64()),
            ("op", pa.string()),
            ("doc_id", pa.string()),
            ("tokens", pa.list_(pa.int32())),
            ("n_tok", pa.int32()),
            ("source", pa.string()),
            ("source_file", pa.string()),
            ("offset", pa.int64()),
            ("event_ts", pa.timestamp("us", tz="UTC")),
        ]
    )


def write_changelog_files(
    pdf: pd.DataFrame,
    out_dir: str,
    n_files: int,
    base_mtime: float | None = None,
    prefix: str = "part",
    start_index: int = 0,
) -> list[str]:
    """Split a pandas changelog into N parquet files with ascending mtimes
    (the streaming file source processes in mtime order — the reference's
    LastModified sort, ``dags/s3_xml_import_pipeline.py:213-221``)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    base = base_mtime if base_mtime is not None else time.time() - 10_000
    step = (len(pdf) + n_files - 1) // n_files
    schema = changelog_arrow_schema()
    extra = [c for c in pdf.columns if c not in schema.names]
    # infer extra-column types ONCE over the whole frame: a per-slice
    # inference on an all-null slice yields pa.null() and the directory's
    # files disagree on the column type
    full_schema = schema
    for c in extra:
        full_schema = full_schema.append(
            pa.field(c, pa.Table.from_pandas(pdf[[c]], preserve_index=False).schema[0].type)
        )
    paths = []
    for i in range(n_files):
        part = pdf.iloc[i * step : (i + 1) * step]
        if part.empty:
            continue
        tbl = pa.Table.from_pandas(part, schema=full_schema, preserve_index=False)
        path = os.path.join(out_dir, f"{prefix}-{start_index + i:04d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (base + i, base + i))
        paths.append(path)
    return paths


def _u(col: Column, seed: int, salt: int) -> Column:
    """Deterministic uniform [0,1) from a column (JVM-side, scales)."""
    return F.pmod(F.xxhash64(col, F.lit(seed + salt)), F.lit(1_000_000)) / 1_000_000.0


def generate_changelog_df(
    spark: SparkSession,
    n_events: int,
    n_docs: int | None = None,
    seed: int = 42,
    hot_fraction: float = 0.3,
    n_hot: int | None = None,
    delete_fraction: float = 0.05,
    avg_tokens: int = 24,
    events_per_file: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic changelog: pure DataFrame expressions.

    Every column is a deterministic function of the row id (= lsn) via
    ``xxhash64`` — no Python in the loop, no driver materialization, so
    this generates 10^10 events on a cluster exactly as it generates 10^5
    locally.
    """
    n_docs = n_docs or max(8, n_events // 4)
    n_hot = n_hot or max(1, n_docs // 100)
    df = spark.range(1, n_events + 1, numPartitions=num_partitions)
    lsn = F.col("id")

    is_hot = _u(lsn, seed, 1) < hot_fraction
    doc_idx = F.when(is_hot, F.pmod(F.xxhash64(lsn, F.lit(seed + 2)), F.lit(n_hot))).otherwise(
        F.pmod(F.xxhash64(lsn, F.lit(seed + 3)), F.lit(n_docs))
    )
    doc_id = F.format_string("doc-%08d", doc_idx)

    op = F.when(_u(lsn, seed, 4) < delete_fraction, F.lit("D")).otherwise(
        F.when(_u(lsn, seed, 5) < 0.3, F.lit("I")).otherwise(F.lit("U"))
    )
    length = (F.pmod(F.xxhash64(lsn, F.lit(seed + 6)), F.lit(max(2, 2 * avg_tokens - 8))) + 4).cast(
        "int"
    )
    tokens = F.when(
        op != "D",
        F.transform(
            F.sequence(F.lit(1), length),
            lambda i: F.pmod(F.xxhash64(lsn, i, F.lit(seed + 7)), F.lit(_VOCAB)).cast("int"),
        ),
    )
    return df.select(
        lsn.alias("lsn"),
        op.alias("op"),
        doc_id.alias("doc_id"),
        tokens.alias("tokens"),
        F.when(op != "D", length).alias("n_tok"),
        F.format_string("src%d", F.pmod(doc_idx, F.lit(5))).alias("source"),
        F.format_string(
            "changelog-%06d.zip", ((lsn - 1) / events_per_file).cast("long")
        ).alias("source_file"),
        F.pmod(lsn - 1, F.lit(events_per_file)).alias("offset"),
        F.timestamp_seconds(F.lit(1704067200) + lsn).alias("event_ts"),
    )
