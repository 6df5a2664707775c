"""Driver-contract query registry: Spark implementation + DuckDB oracle SQL
for every operator family in SURVEY.md §2, plus the training-data-pipeline
operators (dedup / similarity / text analysis / multimodal metadata).

Each entry: ``QUERIES[name] = (fn, oracle_sql | None)`` where
``fn(spark, sf_dir) -> DataFrame`` and the oracle is ANSI-ish SQL DuckDB
runs on the same parquet (views pre-registered by the driver). Column
names/aliases match exactly on both sides; float columns are rounded
in-query on both sides so value-hashes compare equal.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.functions import scalars as S
from data_hub_ejp_xml_pipeline_spark.operators import dedup as D
from data_hub_ejp_xml_pipeline_spark.functions import sampling as SA
from data_hub_ejp_xml_pipeline_spark.operators import text as TX
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest


def _swept_scratch_dir(prefix: str) -> str:
    """Fresh scratch dir on tmpfs, sweeping dirs from DEAD processes plus
    this process's own previous runs (the driver materializes each query
    before the next), never a LIVE concurrent process's."""
    import glob
    import re
    import shutil

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    can_check_liveness = os.path.isdir("/proc")
    for stale in glob.glob(os.path.join(scratch, f"{prefix}-*")):
        m = re.search(rf"{prefix}-(\d+)-", os.path.basename(stale))
        owner = int(m.group(1)) if m else None
        if owner == os.getpid():
            pass  # own previous run: always sweepable
        elif not can_check_liveness:
            continue  # no /proc (e.g. macOS): never touch another pid's dir
        elif owner is not None and os.path.exists(f"/proc/{owner}"):
            continue  # owner is (or pid-reuse appears) alive: leave it
        shutil.rmtree(stale, ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{prefix}-{os.getpid()}-", dir=scratch)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _parquet_int_bounds(sf_dir: str, table: str, col: str):
    """Exact (min, max) of an integer column off the parquet footer
    row-group statistics — the pure-metadata read behind every fixture's
    epoch split, with no Spark job (guide §6: make the file metadata do
    the work). Integer parquet statistics are exact (binary stats can be
    truncated; ints never are). Returns None when any row group lacks
    usable stats — callers fall back to the aggregation."""
    import glob as _glob

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{table}.parquet")
    paths = (
        [path]
        if os.path.isfile(path)
        else sorted(_glob.glob(os.path.join(path, "*.parquet")))
    )
    if not paths:
        return None
    lo = hi = None
    for p in paths:
        md = pq.ParquetFile(p).metadata
        names = list(md.schema.names)
        if col not in names:
            return None
        idx = names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if isinstance(lo, bool) or not isinstance(lo, int):
        return None
    if isinstance(hi, bool) or not isinstance(hi, int):
        return None
    return lo, hi


def _event_id_bounds(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(min, max) of ``events.event_id`` — footer stats, Spark-agg
    fallback. Every cdc_* fixture derives its epoch split from these two
    numbers; the values are identical either way (the changelog's ``lsn``
    IS ``event_id``), only the job disappears."""
    b = _parquet_int_bounds(sf_dir, "events", "event_id")
    if b is None:
        r = _t(spark, sf_dir, "events").agg(
            F.min("event_id"), F.max("event_id")
        ).first()
        b = (r[0], r[1])
    return b


# =====================================================================
# CDC core (events table: event_id ≈ lsn, user_id ≈ doc_id,
# event_type='error' plays the delete op)
# =====================================================================

_LWW_ORACLE = """
SELECT user_id,
       event_id   AS last_event_id,
       event_type AS last_event_type,
       round(value, 4) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_lww_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: per-key last-writer-wins via max_by (map-side combinable agg)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by(F.struct("event_id", "event_type", "value"), F.col("event_id")).alias("x")
    ).select(
        "user_id",
        F.col("x.event_id").alias("last_event_id"),
        F.col("x.event_type").alias("last_event_type"),
        F.round("x.value", 4).alias("last_value"),
    )


def q_lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 window variant: row_number over (key order by lsn desc)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


def q_lww_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 grouped-map pandas variant (north-star mandated shape)."""
    import numpy as np
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "value")

    def latest(pdf: pd.DataFrame) -> pd.DataFrame:
        top = pdf.sort_values("event_id").iloc[[-1]]
        # HALF-AWAY-FROM-ZERO rounding to match Spark F.round / DuckDB
        # round: pandas .round is half-to-even and would disagree with the
        # other three LWW variants on exact .5e-4 ties
        v = top["value"].values
        rounded = np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5) / 1e4
        return pd.DataFrame(
            {
                "user_id": top["user_id"].values,
                "last_event_id": top["event_id"].values,
                "last_event_type": top["event_type"].values,
                "last_value": rounded,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        latest,
        schema="user_id bigint, last_event_id bigint, last_event_type string, last_value double",
    )


def q_lww_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 + skew salting: two-phase reduce, salt = pmod(xxhash64(lsn), 8)."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(8)))
    partial = salted.groupBy("user_id", "_salt").agg(
        F.max_by(F.struct("event_id", "event_type", "value"), F.col("event_id")).alias("x")
    )
    return partial.groupBy("user_id").agg(
        F.max_by(F.col("x"), F.col("x.event_id")).alias("x")
    ).select(
        "user_id",
        F.col("x.event_id").alias("last_event_id"),
        F.col("x.event_type").alias("last_event_type"),
        F.round("x.value", 4).alias("last_value"),
    )


_CDC_FINAL_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS final_event_type,
       round(value, 4) AS final_value,
       event_id AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


_CDC_DIFF_ORACLE = """
WITH bounds AS (
  SELECT (min(event_id) + max(event_id)) // 2 AS mid
  FROM events
),
ch AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CAST(user_id AS VARCHAR) AS doc_id,
         event_type AS final_event_type,
         round(value, 4) AS final_value
  FROM events
),
s1 AS (
  SELECT * FROM (
    SELECT ch.*, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rn
    FROM ch, bounds WHERE lsn <= mid
  ) t WHERE rn = 1 AND op <> 'D'
),
s2 AS (
  SELECT * FROM (
    SELECT ch.*, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) rn
    FROM ch
  ) t WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(s2.doc_id, s1.doc_id) AS doc_id,
       CASE WHEN s1.doc_id IS NULL THEN 'insert'
            WHEN s2.doc_id IS NULL THEN 'delete'
            WHEN s1.lsn <> s2.lsn THEN 'update' END AS change_type,
       CASE WHEN s2.doc_id IS NOT NULL THEN s2.final_event_type
            ELSE s1.final_event_type END AS final_event_type,
       CASE WHEN s2.doc_id IS NOT NULL THEN s2.final_value
            ELSE s1.final_value END AS final_value,
       s1.lsn AS from_lsn, s2.lsn AS to_lsn
FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id
WHERE (CASE WHEN s1.doc_id IS NULL THEN 'insert'
            WHEN s2.doc_id IS NULL THEN 'delete'
            WHEN s1.lsn <> s2.lsn THEN 'update' END) IS NOT NULL
"""


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog-scan end-to-end: events split at the median LSN into two
    REAL merges (v1, v2); ``SnapshotTable.diff(v1, v2)`` must equal the
    change set an independent SQL oracle derives from the raw events —
    inserts, LSN-guarded updates, tombstoned deletes, untouched rows
    absent."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("cdcdiff") + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    table.merge(reduce_latest(changelog.filter(F.col("lsn") <= mid)), batch_id=0)
    v1 = table.current_version()
    table.merge(reduce_latest(changelog.filter(F.col("lsn") > mid)), batch_id=1)
    return table.diff(v1).select(
        "doc_id",
        F.col("_change_type").alias("change_type"),
        "final_event_type",
        "final_value",
        F.col("_from_lsn").alias("from_lsn"),
        F.col("_to_lsn").alias("to_lsn"),
    )


def q_cdc_engine_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end engine check: events → changelog (error ⇒ delete) applied
    through the REAL snapshot table in 3 incremental merges; final state
    must equal the one-shot SQL LWW view. Exercises reduce + bucketed COW
    merge + tombstones + LSN guard against an independent oracle."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    # tmpfs when present: the query measures the engine, not /tmp's
    # virtual-disk write path. The returned DataFrame stays lazy over the
    # table files, so THIS run's dir cannot be removed here — instead each
    # invocation sweeps dirs from DEAD processes plus this process's own
    # previous runs (the driver materializes each query before the next),
    # never a LIVE concurrent process's.
    root = _swept_scratch_dir("cdcq") + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        table.merge(reduce_latest(batch), batch_id=i)
    return table.read().select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


_CDC_MAINT_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS final_event_type,
       round(value, 4) AS final_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_maintenance_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational verbs end-to-end (maintenance + fsck + clone): four
    LSN-ordered merges with a ``MaintenancePolicy`` pass after EVERY
    epoch — compaction (threshold 2 files/bucket), snapshot expiry
    (keep 2) and tombstone vacuum (every 2nd pass, watermark = the
    epoch's committed max LSN) all fire mid-stream — then
    ``verify(deep=True)`` must report zero violations and the final
    state is ``clone()``d and read back THROUGH THE CLONE. Oracle: the
    plain LWW live view — maintenance must never change query results.
    The in-query raises turn a verb that silently stopped firing into a
    driver 'err' instead of a silent coverage loss."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.maintenance import MaintenancePolicy
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("cdcmaint")
    table = SnapshotTable.create(
        spark, root + "/tbl", payload, key="doc_id", n_buckets=8,
        stats_cols=["_lsn"],
    )
    policy = MaintenancePolicy(
        table, max_files_per_bucket=1, keep_snapshots=2,
        vacuum_slack_lsn=0, vacuum_every=2,
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 4 + 1, 1)
    passes = []
    for i in range(4):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        table.merge(reduce_latest(batch), batch_id=i)
        # the stream's committed offset, as ChangelogTailer would hand it
        passes.append(policy.run(watermark_lsn=min(lo + (i + 1) * step - 1, hi)))
    # big LSN-ordered epochs touch every file, so the COW rewrite keeps
    # buckets at target fan-out — growth (what compaction exists for)
    # comes from merges whose keys MISS every existing file's key range.
    # Insert three synthetic keys that sort beyond every numeric doc_id
    # ('zz-' > any digit), so their files land NEXT TO the carried ones
    # (deterministic growth, independent of AQE partition coalescing) —
    # then delete them, so the final state (and the oracle) is untouched:
    # insert → compaction folds the extra file → delete → vacuum reclaims.
    synth = [(hi + 1 + j, "U", f"zz-maint-{j}", "synthetic", 0.0)
             for j in range(3)]
    schema = ("lsn long, op string, doc_id string, final_event_type string,"
              " final_value double")
    table.merge(reduce_latest(spark.createDataFrame(synth, schema)),
                batch_id=4)
    passes.append(policy.run(watermark_lsn=hi + 3))
    kill = [(hi + 11 + j, "D", f"zz-maint-{j}", None, None)
            for j in range(3)]
    table.merge(reduce_latest(spark.createDataFrame(kill, schema)),
                batch_id=5)
    passes.append(policy.run(watermark_lsn=hi + 13))
    passes.append(policy.run(watermark_lsn=hi + 13))  # vacuum_every=2 phase
    if not any(p["compacted"] for p in passes):
        raise AssertionError("compaction never fired across the loop")
    if not any(p["vacuumed"] for p in passes):
        raise AssertionError("vacuum never fired across the loop")
    if not any(p["expired_manifests"] for p in passes):
        raise AssertionError("snapshot expiry never fired across the loop")
    chk = table.verify(deep=True)
    if not chk["ok"]:
        raise AssertionError(f"fsck violations after maintenance: {chk['errors']}")
    replica = table.clone(root + "/clone")
    return replica.read().select("doc_id", "final_event_type", "final_value")


_CDC_LOOKUP_ORACLE = f"""
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS final_event_type,
       round(value, 4) AS final_value,
       event_id AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
  AND {SA.md5_mod_sql('user_id', SA.SAMPLE_BASIS)} < 3000
"""


def q_cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve-path end-to-end: events applied through the REAL snapshot
    table (2 incremental merges), then a deterministic md5-mod sample of
    keys is fetched back through :meth:`SnapshotTable.lookup` — the
    bucket-pruned / range-pruned / bloom-assisted point-lookup path — and
    must equal the one-shot SQL LWW view restricted to the same sample.
    The sample predicate is the shared cross-engine idiom
    (functions/sampling.py), so the oracle reproduces the exact key set
    without the oracle ever seeing the collected list."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("cdclkp") + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    table.merge(reduce_latest(changelog.filter(F.col("lsn") <= mid)), batch_id=0)
    table.merge(reduce_latest(changelog.filter(F.col("lsn") > mid)), batch_id=1)
    keys = [
        r[0]
        for r in changelog.select("doc_id")
        .distinct()
        .filter(SA.md5_mod_col(F.col("doc_id"), SA.SAMPLE_BASIS) < 3000)
        .collect()
    ]
    return table.lookup(keys).select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


def _dlq_dirty_changelog(spark: SparkSession, sf_dir: str):
    """Deterministically corrupted changelog off ``events``: three
    md5-banded corruption classes (null/empty key, null LSN, unknown op)
    over the same clean mapping every cdc_* query uses. The band idiom is
    functions/sampling.py's shared cross-engine score, so the DuckDB
    oracle reproduces the exact corrupted set without any row exchange."""
    ev = _t(spark, sf_dir, "events")
    m = SA.md5_mod_col(F.col("event_id"), SA.SAMPLE_BASIS)
    return ev.select(
        F.when((m >= 300) & (m < 600), F.lit(None).cast("long"))
        .otherwise(F.col("event_id"))
        .alias("lsn"),
        F.when((m >= 600) & (m < 900), F.lit("X"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.when(m < 150, F.lit(None).cast("string"))
        .when(m < 300, F.lit(""))
        .otherwise(F.col("user_id").cast("string"))
        .alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )


# the oracle's rendering of the same corruption + first-match reasons;
# `m` is the shared md5 band score over event_id
_DLQ_BASE_SQL = f"""
  SELECT {SA.md5_mod_sql('event_id', SA.SAMPLE_BASIS)} AS m,
         CASE WHEN {SA.md5_mod_sql('event_id', SA.SAMPLE_BASIS)} BETWEEN 300 AND 599
              THEN NULL ELSE event_id END AS lsn,
         CASE WHEN {SA.md5_mod_sql('event_id', SA.SAMPLE_BASIS)} BETWEEN 600 AND 899 THEN 'X'
              WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         CASE WHEN {SA.md5_mod_sql('event_id', SA.SAMPLE_BASIS)} < 150 THEN NULL
              WHEN {SA.md5_mod_sql('event_id', SA.SAMPLE_BASIS)} < 300 THEN ''
              ELSE CAST(user_id AS VARCHAR) END AS doc_id,
         event_type AS final_event_type,
         round(value, 4) AS final_value
  FROM events
"""

_DLQ_REJECTS_ORACLE = f"""
WITH dirty AS ({_DLQ_BASE_SQL}),
bounds AS (SELECT (min(event_id) + max(event_id)) // 2 AS mid
           FROM events)
SELECT CASE WHEN m < 300 THEN 'null_key'
            WHEN m < 600 THEN 'null_lsn'
            WHEN m < 900 THEN 'bad_op' END AS reject_reason,
       CASE WHEN lsn IS NULL OR lsn <= (SELECT mid FROM bounds)
            THEN 0 ELSE 1 END AS epoch,
       lsn, op, doc_id, final_event_type, final_value
FROM dirty WHERE m < 900
"""


def q_cdc_dlq_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter path end-to-end: the dirty changelog is applied through
    the REAL pipeline (2 epochs, DLQ attached) and the QUARANTINE table is
    returned — every corrupted event, its first-match reason, and the
    epoch that caught it, exactly once. The valid side's merge is
    exercised too (same run), pinned separately by
    ``cdc_dlq_final_state``."""
    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    dirty = _dlq_dirty_changelog(spark, sf_dir)
    root = _swept_scratch_dir("cdcdlq")
    dlq = DlqState(spark, root + "/dlq", payload_schema=dirty.schema)
    pipe = MergePipeline(spark, root + "/tbl", n_buckets=8,
                         payload_schema=_DLQ_PAYLOAD_SCHEMA(), dlq_state=dlq)
    ev = _t(spark, sf_dir, "events")
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    pipe.apply(
        dirty.filter(F.col("lsn").isNull() | (F.col("lsn") <= mid)), batch_id=0
    )
    pipe.apply(dirty.filter(F.col("lsn") > mid), batch_id=1)
    return dlq.read().select(
        "reject_reason", F.col("epoch").cast("int").alias("epoch"),
        "lsn", "op", "doc_id", "final_event_type", "final_value",
    )


_DLQ_FINAL_ORACLE = f"""
WITH dirty AS ({_DLQ_BASE_SQL})
SELECT doc_id, final_event_type, final_value, lsn AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY lsn DESC) AS rn
  FROM dirty WHERE m >= 900
) WHERE rn = 1 AND op <> 'D'
"""


def q_cdc_dlq_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The valid-side guarantee of the dead-letter split: with the DLQ
    attached, the merged table equals the one-shot SQL LWW view over ONLY
    the uncorrupted events — corruption neither poisons the merge (no
    junk null-key row, no null-LSN tie-breaks) nor drops a single clean
    event."""
    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    dirty = _dlq_dirty_changelog(spark, sf_dir)
    root = _swept_scratch_dir("cdcdlqf")
    dlq = DlqState(spark, root + "/dlq", payload_schema=dirty.schema)
    pipe = MergePipeline(spark, root + "/tbl", n_buckets=8,
                         payload_schema=_DLQ_PAYLOAD_SCHEMA(), dlq_state=dlq)
    ev = _t(spark, sf_dir, "events")
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    pipe.apply(
        dirty.filter(F.col("lsn").isNull() | (F.col("lsn") <= mid)), batch_id=0
    )
    pipe.apply(dirty.filter(F.col("lsn") > mid), batch_id=1)
    return pipe.final_state().select(
        "doc_id", "final_event_type", "final_value",
        F.col("_lsn").alias("last_lsn"),
    )


_SECIDX_ORACLE = """
SELECT final_event_type AS value, doc_id
FROM (
  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type AS final_event_type,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND op <> 'D'
"""


def _secidx_pipeline(spark: SparkSession, sf_dir: str, tag: str):
    """Shared fixture: events → 2-epoch COW merge with a live
    SecondaryIndexState on ``final_event_type``."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.secondary_index import (
        SecondaryIndexState,
    )

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir(tag)
    idx = SecondaryIndexState(spark, root + "/idx",
                              index_col="final_event_type", n_buckets=8)
    pipe = MergePipeline(spark, root + "/tbl", n_buckets=8,
                         payload_schema=payload, index_state=idx)
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    pipe.apply(changelog.filter(F.col("lsn") <= mid), batch_id=0)
    pipe.apply(changelog.filter(F.col("lsn") > mid), batch_id=1)
    return pipe, idx


def q_cdc_secondary_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance end-to-end: the inverted index kept per epoch
    (postings appends + tombstones, close side file-pruned off the
    pre-epoch base) must equal the one-shot SQL inverted projection of
    the LWW final state — docs whose value changed across the epoch
    split appear under their FINAL value only, deletes under none."""
    _, idx = _secidx_pipeline(spark, sf_dir, "cdcidx")
    return idx.read_index().select(F.col("value"), F.col("doc_id"))


_SECIDX_LOOKUP_ORACLE = """
SELECT doc_id
FROM (
  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND op <> 'D' AND event_type = 'purchase'
"""


def q_cdc_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index's serve path: one value's keys through the bucket-pruned
    read (``read(buckets=...)`` + per-value LWW reduce) — equal to the
    final state filtered on the indexed column, without scanning it."""
    _, idx = _secidx_pipeline(spark, sf_dir, "cdcidxl")
    return idx.lookup("purchase")


_ZONE_MAP_ORACLE = """
SELECT doc_id, final_event_type, final_value, last_lsn
FROM (
  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type AS final_event_type,
         round(value, 4) AS final_value, event_id AS last_lsn,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND op <> 'D'
  AND final_value >= 25.0 AND final_value <= 75.0
"""


def q_cdc_zone_map_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file skipping end-to-end: the table is created with
    ``stats_cols`` on a payload column, filled by two REAL merges +
    a range-partitioning compaction, then read through
    :meth:`SnapshotTable.read_range` — which must equal the one-shot SQL
    LWW view under the same range predicate while opening only the files
    whose recorded min/max can overlap (the non-key analog of the
    serve path's key pruning)."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("cdczone") + "/tbl"
    table = SnapshotTable.create(
        spark, root, payload, key="doc_id", n_buckets=8,
        files_per_bucket=4, stats_cols=["final_value"],
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    table.merge(reduce_latest(changelog.filter(F.col("lsn") <= mid)), batch_id=0)
    table.merge(reduce_latest(changelog.filter(F.col("lsn") > mid)), batch_id=1)
    table.compact_files(max_files_per_bucket=1)
    return table.read_range("final_value", 25.0, 75.0).select(
        "doc_id", "final_event_type", "final_value",
        F.col("_lsn").alias("last_lsn"),
    )


def _DLQ_PAYLOAD_SCHEMA():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )


def q_cdc_mor_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same end-to-end engine check as ``cdc_engine_final_state`` run
    through the MERGE-ON-READ pipeline (plans.mor_pipeline): 3 epochs are
    durable APPENDs to the delta table; ``k_compact=2`` folds the first
    two into the base with ONE merge and leaves the third staged — so the
    returned DataFrame is the merge-view (base ∪ staged deltas, LWW
    reduced), not a plain table read. Must equal the identical one-shot
    SQL LWW oracle, pinning the group-commit path against the same
    independent truth as the per-epoch COW path."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("morq")
    pipe = MorPipeline(
        spark, root, key="doc_id", n_buckets=8, k_compact=2, payload_schema=payload
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    return pipe.final_state().select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


def q_cdc_mor_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cdc_point_lookup``'s serve-path check for the MERGE-ON-READ
    pipeline: after 2 compacted + 1 staged epochs, fetch the md5-mod key
    sample through :meth:`MorPipeline.lookup` — base AND staged-delta
    reads both bucket/range/bloom file-pruned, LWW reconciled over only
    the fetched rows — and match the one-shot SQL LWW view restricted to
    the same sample."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("morlkp")
    pipe = MorPipeline(
        spark, root, key="doc_id", n_buckets=8, k_compact=2, payload_schema=payload
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    keys = [
        r[0]
        for r in changelog.select("doc_id")
        .distinct()
        .filter(SA.md5_mod_col(F.col("doc_id"), SA.SAMPLE_BASIS) < 3000)
        .collect()
    ]
    return pipe.lookup(keys).select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


_CHANGEFEED_ORACLE = """
WITH bounds AS (
  SELECT (min(event_id) + max(event_id)) // 2 AS mid FROM events
),
w1 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events e, bounds WHERE event_id <= mid
  ) WHERE rn = 1
),
w2 AS (
  SELECT * FROM (
    SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events e
  ) WHERE rn = 1
)
SELECT CAST(w2.user_id AS VARCHAR) AS doc_id,
       w2.event_type AS final_event_type,
       round(w2.value, 4) AS final_value,
       CASE WHEN w2.event_type = 'error' THEN 'D' ELSE 'U' END AS op,
       w2.event_id AS lsn
FROM w2 LEFT JOIN w1 ON w1.user_id = w2.user_id
WHERE w1.user_id IS NULL OR w1.event_id <> w2.event_id
"""


def q_cdc_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-out: two incremental merges, then
    :meth:`SnapshotTable.changelog_between` between them must emit
    exactly the keys whose LWW winner moved — to-side payload, op from
    the to-side state (tombstone ⇒ D with the tombstone's LSN), quiet
    keys absent. The oracle derives the same set from the raw events:
    overall winner vs winner-at-the-split, emitted when they differ.
    This is the replication feed a downstream MergePipeline applies
    verbatim (tests/test_changefeed.py pins round-trip equality)."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("cdcfeed") + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (lo + hi) // 2
    table.merge(reduce_latest(changelog.filter(F.col("lsn") <= mid)), batch_id=0)
    v1 = table.current_version()
    table.merge(reduce_latest(changelog.filter(F.col("lsn") > mid)), batch_id=1)
    return table.changelog_between(v1).select(
        "doc_id", "final_event_type", "final_value", "op", "lsn"
    )


_IVM_ORACLE = """
WITH latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
)
SELECT event_type AS grp,
       count(*) AS cnt,
       CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS total
FROM latest GROUP BY event_type
"""


def q_ivm_group_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance end-to-end: events applied through
    the REAL pipeline in 3 epochs with an :class:`plans.ivm.
    IncrementalAggState` attached (group = final event type, value = the
    fixed-point event value — integer-valued so the incremental sum and
    the oracle's one-shot sum are bit-identical, no float-order drift).
    The maintained totals table — updated per epoch at O(batch + groups)
    cost from the changelog, with old-group retraction read from the
    pre-epoch base via the merge's own file pruning — must equal the
    GROUP BY over the one-shot SQL LWW view. The reference recomputes
    its aggregates per query; this is the 100 TB replacement."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round(F.col("value") * 10000).cast("long").alias("value_fp"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("value_fp", T.LongType()),
        ]
    )
    root = _swept_scratch_dir("ivmq")
    ivm = IncrementalAggState(
        spark, root + "/ivm", group_col="final_event_type", value_col="value_fp"
    )
    pipe = MergePipeline(
        spark, root + "/tbl", key="doc_id", n_buckets=8,
        payload_schema=payload, ivm_state=ivm,
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    return ivm.read_totals().select(
        F.col("final_event_type").alias("grp"),
        F.col("cnt"),
        F.col("total").cast("long").alias("total"),
    )


# SCD Type-2 oracle: the epoch winner per key (same 3 LSN-range epochs
# the engine applies), versions ordered per key, valid_to = the next
# applied winner's LSN (a delete winner closes but emits no row)
_SCD2_ORACLE = """
WITH b AS (
  SELECT min(event_id) AS lo,
         ((max(event_id) - min(event_id) + 1) // 3) + 1 AS step
  FROM events
),
w AS (
  SELECT e.*,
         (e.event_id - b.lo) // b.step AS epoch,
         row_number() OVER (
           PARTITION BY e.user_id, (e.event_id - b.lo) // b.step
           ORDER BY e.event_id DESC
         ) AS rn
  FROM events e, b
),
win AS (SELECT * FROM w WHERE rn = 1),
seq AS (
  SELECT *,
         lead(event_id) OVER (PARTITION BY user_id ORDER BY event_id)
           AS next_lsn
  FROM win
)
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_id AS valid_from_lsn,
       next_lsn AS valid_to_lsn,
       (next_lsn IS NULL) AS is_current,
       event_type AS final_event_type,
       round(value, 4) AS final_value
FROM seq WHERE event_type <> 'error'
"""


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 end-to-end: events applied through the REAL pipeline in
    3 epochs with a :class:`plans.scd2.Scd2State` attached. Every applied
    epoch winner opens a version; the row it replaces is closed at the
    winner's LSN (delete winners close and open nothing). The maintained
    history — built per epoch at O(batch + touched files) cost, never a
    rescan — must equal the one-shot SQL derivation (winner per key per
    epoch + lead over winners). The reference truncate-and-reloads its
    BigQuery tables with no history; this is the point-in-time audit
    surface a training-data lake needs."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("scd2q")
    scd2 = Scd2State(spark, root + "/scd2", payload_schema=payload, key="doc_id")
    pipe = MergePipeline(
        spark, root + "/tbl", key="doc_id", n_buckets=8,
        payload_schema=payload, scd2_state=scd2,
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    return scd2.read_history().select(
        "doc_id", "valid_from_lsn", "valid_to_lsn", "is_current",
        "final_event_type", "final_value",
    )


# as-of serve path: history versions are epoch-granular (one version per
# key per applied epoch winner), so the state visible AT lsn L is, per
# key, the max-LSN EPOCH winner whose lsn <= L — a full-epoch winner
# above L leaves the prior version visible even though its close row
# exists (valid_from <= L < valid_to doing real work). L sits mid-epoch-1
# to force exactly that case.
_SCD2_ASOF_ORACLE = """
WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
p AS (SELECT lo, (hi - lo + 1) // 3 + 1 AS step FROM b),
l AS (SELECT lo + step + step // 2 AS asof_lsn FROM p),
ew AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (
           PARTITION BY user_id, (event_id - p.lo) // p.step
           ORDER BY event_id DESC
         ) AS rn
  FROM events, p
),
vis AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn2
  FROM ew WHERE rn = 1 AND event_id <= (SELECT asof_lsn FROM l)
)
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS final_event_type,
       round(value, 4) AS final_value,
       event_id AS valid_from_lsn
FROM vis WHERE rn2 = 1 AND event_type <> 'error'
"""


def q_cdc_scd2_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2's reason to exist — the point-in-time serve path: the same
    3-epoch pipeline as :func:`q_cdc_scd2_history`, then
    ``read_as_of(L)`` for an L strictly inside the second epoch. The
    read prunes history files via the ``valid_from_lsn`` zone maps
    (``read_range``), and the interval filter must resurrect versions
    whose replacement sits above L. Oracle: per-key max epoch winner
    with lsn <= L, delete winners excluded."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("scd2asof")
    scd2 = Scd2State(spark, root + "/scd2", payload_schema=payload, key="doc_id")
    pipe = MergePipeline(
        spark, root + "/tbl", key="doc_id", n_buckets=8,
        payload_schema=payload, scd2_state=scd2,
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    asof = lo + step + step // 2
    return scd2.read_as_of(asof).select(
        "doc_id", "final_event_type", "final_value", "valid_from_lsn"
    )


# transaction-boundary atomicity: events arrive in fixed blocks of 16
# (txn_id = event_id // 16; the tail block is shorter), the simulated
# loss drops some members, and ONLY complete transactions may apply —
# a partially-received transaction must never leak into the table
_TXN_ORACLE = """
WITH hi AS (SELECT max(event_id) AS hi FROM events),
ev AS (
  SELECT e.*, e.event_id // 16 AS txn_id
  FROM events e WHERE NOT {loss}
),
cnt AS (SELECT txn_id, count(*) AS present FROM ev GROUP BY txn_id),
ok AS (
  SELECT c.txn_id FROM cnt c, hi
  WHERE c.present = least(16, hi.hi + 1 - c.txn_id * 16)
),
kept AS (SELECT ev.* FROM ev JOIN ok USING (txn_id))
SELECT user_id,
       event_id   AS last_event_id,
       event_type AS last_event_type,
       round(value, 4) AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM kept
) WHERE rn = 1
"""


def q_cdc_txn_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-boundary grouping (Debezium txn-metadata semantics):
    hold back incomplete transactions, apply complete ones atomically.
    Events carry (txn_id, expected member count); the operator admits a
    transaction only when every member arrived — one hash shuffle on
    txn_id (window count == expected), no joins — then the usual LWW
    final state over the admitted events. The simulated loss knocks out
    members of some transactions; their SURVIVING members must not apply
    either (partial-transaction leak is the bug class this kills)."""
    from data_hub_ejp_xml_pipeline_spark.operators.txn import complete_transactions

    ev = _t(spark, sf_dir, "events")
    hi = _event_id_bounds(spark, sf_dir)[1]
    observed = ev.filter(f"NOT {_LOSS_SQL}").withColumn(
        "txn_id", (F.col("event_id") / 16).cast("long")
    ).withColumn(
        "txn_n", F.least(F.lit(16), F.lit(hi) + 1 - F.col("txn_id") * 16)
    )
    kept = complete_transactions(
        observed, txn_col="txn_id", expected_col="txn_n"
    )
    return kept.groupBy("user_id").agg(
        F.max_by(F.struct("event_id", "event_type", "value"), F.col("event_id")).alias("x")
    ).select(
        "user_id",
        F.col("x.event_id").alias("last_event_id"),
        F.col("x.event_type").alias("last_event_type"),
        F.round("x.value", 4).alias("last_value"),
    )


# DBLog-style snapshot bootstrap: a consistent snapshot at watermark W
# merged in key-hash chunks, interleaved with post-W tail epochs in an
# order the LSN guard must make irrelevant; final state == full replay
_SNAPSHOT_BOOTSTRAP_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS final_event_type,
       round(value, 4) AS final_value,
       event_id AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_snapshot_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap-without-replay (the DBLog / Debezium incremental-snapshot
    shape): a new table is seeded from a consistent snapshot at watermark
    W — merged in 4 key-hash chunks, each an exactly-once ledgered merge
    carrying each row's TRUE last LSN — while the tail applies post-W
    epochs CONCURRENTLY (here: interleaved chunk/tail commits). The
    merge's LSN guard makes the interleaving order irrelevant: a tail
    update or delete beats the older snapshot row for the same key no
    matter which lands first. Final state must equal a full-history
    replay — which is the whole point: at 100 TB you bootstrap from the
    snapshot and never replay the historical changelog."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    w_mark = (lo + hi) // 2
    # the consistent snapshot at W: per-key winners over lsn <= W, live
    # rows only, each carrying its true last LSN (what a source-table
    # chunk SELECT returns under DBLog's low/high watermark fencing)
    # the snapshot reduce feeds FOUR chunk merges — cache it so the
    # per-key winner derivation over lsn <= W runs once, and each chunk
    # merge is a cheap filter over the cached winners (what a real DBLog
    # bootstrap does too: the source pays the snapshot query once and
    # serves chunks from it)
    snapshot = reduce_latest(changelog.filter(F.col("lsn") <= w_mark)).filter(
        F.col("op") != "D"
    ).persist()
    n_chunks = 4
    chunk_col = F.abs(F.hash("doc_id")) % n_chunks
    tail = changelog.filter(F.col("lsn") > w_mark)
    mid_tail = (w_mark + hi) // 2
    root = _swept_scratch_dir("cdcboot") + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    # interleave chunk and tail commits; batch ids are disjoint monotone
    steps = [
        ("chunk", 0), ("tail", 0), ("chunk", 1), ("chunk", 2),
        ("tail", 1), ("chunk", 3),
    ]
    try:
        for kind, i in steps:
            if kind == "chunk":
                batch = snapshot.filter(chunk_col == i)
                table.merge(batch, batch_id=100 + i)
            else:
                lo_i = w_mark + 1 if i == 0 else mid_tail + 1
                hi_i = mid_tail if i == 0 else hi
                batch = tail.filter((F.col("lsn") >= lo_i) & (F.col("lsn") <= hi_i))
                table.merge(reduce_latest(batch), batch_id=200 + i)
    finally:
        snapshot.unpersist()
    return table.read().select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


# deterministic "lost events" condition for the gap-detection query:
# singleton losses (every 1000th) + a 1001-wide block loss that spans
# multiple detector buckets, exercising both the intra-bucket window and
# the inter-bucket envelope paths
_LOSS_SQL = "(event_id % 1000 = 7 OR (event_id % 5000) BETWEEN 2000 AND 3000)"

_LSN_GAPS_ORACLE = f"""
WITH obs AS (
  SELECT DISTINCT event_id AS lsn FROM events WHERE NOT {_LOSS_SQL}
),
s AS (SELECT lsn, lead(lsn) OVER (ORDER BY lsn) AS nxt FROM obs)
SELECT lsn + 1 AS gap_start, nxt - 1 AS gap_end, nxt - lsn - 1 AS n_missing
FROM s WHERE nxt > lsn + 1
"""


def q_lsn_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog integrity: missing-LSN ranges over a stream with
    simulated losses. The oracle is the textbook single-window form; the
    engine runs operators.integrity.lsn_gaps — a bucketed two-level plan
    whose unpartitioned window only ever sees the ~n/bucket_size
    per-bucket envelope, never the data (the textbook form funnels every
    row through one reducer)."""
    from data_hub_ejp_xml_pipeline_spark.operators.integrity import lsn_gaps

    ev = _t(spark, sf_dir, "events")
    observed = ev.filter(
        ~((F.col("event_id") % 1000 == 7)
          | ((F.col("event_id") % 5000).between(2000, 3000)))
    )
    return lsn_gaps(observed, lsn_col="event_id", bucket_size=500)


def q_watermark_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per-pattern max-LSN watermark (etl_state.py:65-76 analog)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.max("event_id").alias("watermark_lsn"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_ordered_replay_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/O1: LastModified-order replay → per-key sequence numbers."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).alias("seq")
    )


def q_anti_join_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: anti-join against committed/known keys (watermark exclusion)."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey, "left_anti")
        .select("user_id")
        .distinct()
    )


def q_dispatch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/U1/U2: root-tag dispatch into branches, unioned by name with
    missing columns (the reference's dual-spelling union)."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", F.round("value", 4).alias("value"), F.lit("purchase").alias("branch")
    )
    signups = ev.filter("event_type = 'signup'").select(
        "event_id", "user_id", F.lit("signup").alias("branch")
    )
    return purchases.unionByName(signups, allowMissingColumns=True)


def q_scalar_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P9/P11/P13: scalar-function layer over a real table."""
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ: render wall time + literal 'Z' so the result is
    # independent of the (driver's) session timezone, matching the oracle's
    # strftime where Z is also literal. P9's tz-aware variant lives in
    # scalars.format_iso_utc.
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))
    return ev.select(
        "event_id",
        iso.alias("iso_ts"),
        S.to_int(F.regexp_extract("props", r'"k": (\d+)', 1)).alias("k"),
        S.version_id("event_type", iso).alias("version_id"),
    )


def q_missing_ratio_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: missing/low-value ratio + 3 examples per group
    (ejp_person_xml.py:239-255 analog)."""
    ev = _t(spark, sf_dir, "events")
    low = F.when(F.col("value") < 1.0, F.col("event_id"))
    # examples as a comma-joined string (not array<bigint>): the driver's
    # canonicalizer sorts rows with pandas and dies on unhashable list cells.
    return ev.groupBy("event_type").agg(
        F.round(F.avg(F.when(F.col("value") < 1.0, 1).otherwise(0)) * 100, 4).alias("pct_low"),
        F.concat_ws(",", F.slice(F.sort_array(F.collect_list(low)), 1, 3)).alias("examples"),
    )


def q_tumbling_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped tumbling-window aggregation, batch-expressed:
    F.window(ts, 1 hour) × event_type → count + sum. The same expression
    runs under readStream + withWatermark (§2.9); batch form is what the
    DuckDB oracle can check."""
    ev = _t(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return ev.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    ).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + cumulative gap count (streaming session
    window, batch-expressed)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # interval arithmetic on TIMESTAMP_NTZ is session-tz-free (unlike
    # unix_timestamp, which interprets wall time in the session zone)
    gap = F.col("ts") - F.lag("ts").over(w)
    brk = F.when(gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0)
    sess = ev.withColumn("session_no", F.sum(brk).over(w))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event_id"),
        F.max("event_id").alias("last_event_id"),
    )


# ---------------------------------------------------------------------
# Streaming forms of the windowed family (§2.9 engine tier): the batch
# expressions above (tumbling_window_stats / sessionize) model the math;
# these run the REAL append-mode watermarked stream — file-source drain,
# bounded state, exactly-once ledgered sink — and return the finalized
# windows. The oracle mirrors Spark's finalization rule exactly: the
# final watermark is floor_ms(max event_ts) - delay (Spark tracks event
# times in milliseconds), and a window/session is emitted iff its end is
# <= that watermark (tie convention verified empirically: end == wm
# emits).
# ---------------------------------------------------------------------

def _events_stream_dir(spark: SparkSession, sf_dir: str, prefix: str) -> str:
    """Materialize the events table as a 2-file, mtime-ordered parquet
    changelog (file 0 = events at or before the event-time midpoint,
    file 1 = the rest) so a ``maxFilesPerTrigger=1`` file-source stream
    replays it in event-time order across two microbatches — the
    watermark then genuinely advances mid-stream. Returns the scratch
    root (``chg/`` under it holds the files).

    Fully distributed (no driver toPandas hop — that single-threaded
    collect+re-encode of the whole table dominated the fixture at
    sf0.1): each half is a one-task coalesced Spark write renamed into
    place. The split point is the event-TIME midpoint rather than the
    row median; any time-ordered split yields the identical emitted
    set — batch 2's minimum event time exceeds batch 1's watermark (no
    late drops), and append-mode finalization depends only on the FINAL
    watermark, which the split cannot move."""
    import glob as _glob
    import shutil as _shutil

    root = _swept_scratch_dir(prefix)
    chg = os.path.join(root, "chg")
    os.makedirs(chg)
    sel = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("lsn"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("source"),
        F.col("ts").alias("event_ts"),
    )
    lo, hi = sel.agg(F.min("event_ts"), F.max("event_ts")).first()
    boundary = lo + (hi - lo) / 2
    halves = (
        sel.filter(F.col("event_ts") <= F.lit(boundary)),
        sel.filter(F.col("event_ts") > F.lit(boundary)),
    )
    for i, part in enumerate(halves):
        tmp = os.path.join(root, f"_half{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        files = sorted(_glob.glob(os.path.join(tmp, "part-*.parquet")))
        if len(files) != 1:  # coalesce(1) = one task = one file
            raise AssertionError(f"expected one file in {tmp}, got {files}")
        path = os.path.join(chg, f"part-{i}.parquet")
        os.replace(files[0], path)
        _shutil.rmtree(tmp, ignore_errors=True)
        # file-source arrival order is mtime order — pin it
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return root


_STREAM_EV_FIELDS = [
    ("lsn", "long"),
    ("doc_id", "string"),
    ("source", "string"),
    # TIMESTAMP (not NTZ): withWatermark requires it. The query pins the
    # session tz to UTC for its whole lifetime, so the naive parquet
    # values read as UTC wall time and window alignment matches the
    # oracle's tz-free time_bucket.
    ("event_ts", "timestamp"),
]


def _run_windowed_stream(spark, root, rolled_fn, payload, key):
    """Shared drain: readStream over ``root/chg`` -> rolled_fn(stream) ->
    append-mode availableNow drain through a ledgered SnapshotTable
    append (exactly-once epochs), timestamps rendered to strings INSIDE
    the batch (under the pinned UTC tz) so the returned frame is
    tz-independent."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    schema = T.StructType(
        [T.StructField(n, getattr(T, {"long": "LongType", "string": "StringType",
                                      "timestamp": "TimestampType"}[t])())
         for n, t in _STREAM_EV_FIELDS]
    )
    sink = SnapshotTable.create(
        spark, os.path.join(root, "tbl"), payload, key=key, n_buckets=4
    )
    ts_cols = [f.name for f in payload.fields
               if f.name.endswith(("_start", "_end"))]

    def _append(df, bid):
        out = df.select(
            *[F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(c)
              if c in ts_cols else F.col(c)
              for c in [f.name for f in payload.fields]]
        )
        sink.append(out, batch_id=bid)

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(root, "chg"))
        )
        q = (
            rolled_fn(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .trigger(availableNow=True)
            .foreachBatch(_append)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    return sink


# final watermark, Spark-faithful: event times tracked in ms (floor),
# delay 30 min = 1_800_000_000 us
_STREAM_WM_SQL = (
    "SELECT make_timestamp((epoch_us(max(ts)) // 1000) * 1000 - 1800000000)"
    " FROM events"
)

_WINDOWED_STREAM_ORACLE = f"""
WITH w AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type AS source,
         count(*) AS n_events, max(event_id) AS max_lsn
  FROM events GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS window_end,
       source, n_events, max_lsn
FROM w
WHERE ws + INTERVAL '1 hour' <= ({_STREAM_WM_SQL})
"""


def q_windowed_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 streaming form, end-to-end: the events changelog is drained
    through ``streaming/windowed.py::windowed_rollup`` (withWatermark +
    tumbling window, append mode — state is O(active windows), finalized
    windows emit exactly once) into a ledgered SnapshotTable append sink,
    across two real microbatches plus the no-data finalization batch.
    Returns the finalized windows; the oracle is the same GROUP BY over
    events restricted to windows whose end the final watermark passed.
    ``tests/test_streaming_windowed.py`` pins the stream==batch equality
    and the late-drop; this entry pins the streamed result against an
    independent engine."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.streaming.windowed import windowed_rollup

    root = _events_stream_dir(spark, sf_dir, "wrollq")
    payload = T.StructType(
        [
            T.StructField("window_start", T.StringType()),
            T.StructField("window_end", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_lsn", T.LongType()),
        ]
    )
    sink = _run_windowed_stream(
        spark,
        root,
        lambda s: windowed_rollup(
            s, window="1 hour", delay="30 minutes", group_col="source"
        ).drop("approx_keys"),  # HLL estimate: real, but not oracle-matchable
        payload,
        key="window_start",
    )
    return sink.read().select(
        "window_start", "window_end", "source", "n_events", "max_lsn"
    )


_SESSION_STREAM_ORACLE = f"""
WITH g AS (
  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT doc_id, event_id, ts,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY ts, event_id) AS session_no
  FROM g
), agg AS (
  SELECT doc_id, min(ts) AS s_start, max(ts) + INTERVAL '30 minutes' AS s_end,
         count(*) AS n_events, min(event_id) AS first_lsn,
         max(event_id) AS last_lsn
  FROM s GROUP BY doc_id, session_no
)
SELECT strftime(s_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(s_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       doc_id, n_events, first_lsn, last_lsn
FROM agg
WHERE s_end <= ({_STREAM_WM_SQL})
"""


def q_session_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows, streamed: ``session_rollup`` (native
    ``F.session_window``, 30-min gap, 30-min watermark delay) over the
    same two-microbatch drain — open sessions merge across the batch
    boundary in the state store, closed sessions emit exactly once into
    the ledgered sink. The oracle derives sessions independently
    (lag/cumsum) and keeps those whose end (last event + gap) the final
    watermark passed — i.e. the closed set Spark must have emitted."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.streaming.windowed import session_rollup

    root = _events_stream_dir(spark, sf_dir, "sessq")
    payload = T.StructType(
        [
            T.StructField("session_start", T.StringType()),
            T.StructField("session_end", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("first_lsn", T.LongType()),
            T.StructField("last_lsn", T.LongType()),
        ]
    )
    sink = _run_windowed_stream(
        spark,
        root,
        lambda s: session_rollup(
            s, gap="30 minutes", delay="30 minutes", group_col="doc_id"
        ),
        payload,
        key="doc_id",
    )
    return sink.read().select(
        "session_start", "session_end", "doc_id", "n_events",
        "first_lsn", "last_lsn",
    )


def q_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation == plain groupBy (skew pattern)."""
    ev = _t(spark, sf_dir, "events")
    partial = ev.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(8))).groupBy(
        "user_id", "_salt"
    ).agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("v"))
    return partial.groupBy("user_id").agg(
        F.sum("c").alias("n_events"), F.round(F.sum("v"), 4).alias("sum_value")
    )


# =====================================================================
# Analytics proofs (join/agg/sort/limit operator coverage)
# =====================================================================

_TPCH_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        # timestamp_ntz literal: no session-tz coercion against the NTZ column
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TOP_ORDERS_ORACLE = """
SELECT o.o_orderkey, o.o_orderdate::VARCHAR AS orderdate,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


def q_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


_REGION_ORACLE = """
SELECT r.r_name AS region, count(*) AS n_customers,
       round(sum(c.c_acctbal), 4) AS total_acctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name
"""


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3-style small-dim lookup: explicit broadcast of nation+region."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    dims = F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey))
    return (
        cust.join(dims, cust.c_nationkey == dims.n_nationkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


_ASOF_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS o_orderkey_asof
FROM events e
ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks): latest order per user at or
    before each event's timestamp, via union + carry-forward window."""
    from data_hub_ejp_xml_pipeline_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # one right row per (key, ts): ASOF tie-breaking at equal timestamps is
    # engine-defined, so pin it identically on both sides
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join(
        ev, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        value_cols=["o_orderkey"],
    )
    return out.select("event_id", "user_id", "o_orderkey_asof")


_PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]


def q_pivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
        .na.fill(0, _PIVOT_TYPES)
    )


_PIVOT_ORACLE = "SELECT user_id, " + ", ".join(
    f"count(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in _PIVOT_TYPES
) + " FROM events GROUP BY user_id"


def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup: revenue at (type, user), (type), and grand-total levels."""
    ev = _t(spark, sf_dir, "events")
    return ev.rollup("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count(F.lit(1)).alias("n"),
    )


_ROLLUP_ORACLE = """
SELECT event_type, user_id, round(sum(value), 4) AS total_value, count(*) AS n
FROM events GROUP BY ROLLUP (event_type, user_id)
"""


def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (Spark `percentile`
    == DuckDB `quantile_cont`, both exact linear interpolation)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("vmin"),
        F.round(F.max("value"), 4).alias("vmax"),
    )


_PCT_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 4) AS vmin,
       round(max(value), 4) AS vmax
FROM events GROUP BY event_type
"""


# =====================================================================
# Training-data pipeline: dedup / similarity / text / multimodal
# =====================================================================


# the PRODUCTION shingling — queries must exercise the shipped operator,
# not a private copy that could silently drift from it
_shingles = D.shingles


_DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS fingerprint, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("fingerprint")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


_SHINGLE_CTE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM words, LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i) t
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)
"""

_JACCARD_ORACLE = (
    _SHINGLE_CTE
    + """,
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
"""
)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.8 (quadratic verify over
    shingle-join candidates — the LSH variant below is the scale path).
    Delegates to the PRODUCTION operator so the driver check validates the
    shipped code, not a private copy."""
    return D.jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


_N_MINHASH = 9
_BAND_SIZE = 3


def _minhash_exprs() -> tuple[str, str]:
    """(mins, bands) SQL fragments of the portable minhash family — the
    ONE rendering of the affine-hash/band constants shared by every
    minhash oracle (batch, clusters, incremental)."""
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    base = "(('0x' || substring(md5(s), 1, 7))::BIGINT)"
    mins = ", ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(_N_MINHASH))
    )
    bands = ", ".join(
        "md5("
        + " || '|' || ".join(
            f"CAST(h{b * _BAND_SIZE + j} AS VARCHAR)" for j in range(_BAND_SIZE)
        )
        + f") AS band{b}"
        for b in range(_N_MINHASH // _BAND_SIZE)
    )
    return mins, bands


def _minhash_cte(with_recursive: bool = False) -> str:
    """The shared WITH-chain of every minhash-family oracle — shingles →
    affine minhashes → bands → banded candidates → shingle-intersection
    counts (``inter``; ``sizes`` comes from _SHINGLE_CTE). ONE source of
    truth for the hash family so a tuning change cannot desynchronize the
    oracles. ``with_recursive`` lets callers append recursive CTEs."""
    mins, bands = _minhash_exprs()
    # UNION ALL + explicit outer DISTINCT, NOT a bare UNION chain: under
    # WITH RECURSIVE, DuckDB 1.0 stops deduplicating a UNION inside a
    # non-recursive CTE of the list (observed at sf0.1: cand 287 → 521
    # rows), which double-counts the shingle intersection and turns the
    # Jaccard denominator (na+nb-c) zero or negative — pairs silently
    # vanish from the recursive clusters oracle while the plain pairs
    # oracle stays correct. The explicit-DISTINCT form is
    # semantics-identical in both modes.
    band_joins = "\nUNION ALL\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b "
        f"ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
        for b in range(_N_MINHASH // _BAND_SIZE)
    )
    band_joins = f"SELECT DISTINCT doc_a, doc_b FROM (\n{band_joins}\n) u"
    head = (
        _SHINGLE_CTE.replace("WITH words", "WITH RECURSIVE words")
        if with_recursive
        else _SHINGLE_CTE
    )
    return (
        head
        + f""",
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, {bands} FROM mh),
cand AS ({band_joins}),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS c
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY 1, 2
)"""
    )


def _minhash_oracle() -> str:
    return (
        _minhash_cte()
        + """
SELECT i.doc_a, i.doc_b, round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.8
"""
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → one md5 base per shingle → 9 affine
    universal hashes (min per doc, portable across engines) → 3 bands →
    bucket-join candidates → exact-Jaccard verify ≥ 0.8. The banded join
    replaces the quadratic shingle self-join — this is the 100 TB path.
    Delegates to the PRODUCTION operator (operators.dedup.minhash_lsh_pairs)
    so the driver check validates the shipped code, not a private copy."""
    return D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.8,
        n_hashes=_N_MINHASH,
        band_size=_BAND_SIZE,
    )


def _dedup_clusters_oracle() -> str:
    """Recursive-CTE transitive closure over the verified minhash pairs:
    the oracle for turning near-dup pairs into per-doc cluster decisions.
    Shares the hash-family CTEs with _minhash_oracle via _minhash_cte."""
    return (
        _minhash_cte(with_recursive=True)
        + """,
pr AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.8
),
e AS (SELECT doc_a AS s, doc_b AS d FROM pr UNION SELECT doc_b, doc_a FROM pr),
reach AS (
  SELECT doc_id AS node, doc_id AS comp FROM documents
  UNION
  SELECT e.d, r.comp FROM reach r JOIN e ON e.s = r.node
)
SELECT node AS doc_id, min(comp) AS cluster_id,
       (node = min(comp)) AS is_canonical
FROM reach GROUP BY node
"""
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → DECISIONS: verified minhash near-dup pairs resolved into
    transitive clusters by min-label-propagation connected components
    (operators.dedup.connected_components — iterative DataFrame joins,
    per-round localCheckpoint with the previous round's blocks freed, so
    neither the plan nor storage memory grows with rounds), every document
    labeled (singletons are their own cluster), one canonical doc per
    cluster. ``filter(is_canonical)`` IS the deduplicated corpus."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        docs, threshold=0.8, n_hashes=_N_MINHASH, band_size=_BAND_SIZE
    )
    return D.neardup_clusters(docs, pairs)


# deterministic engine-portable 2-way split for the incremental-dedup query:
# wave 0 = the already-ingested corpus, wave 1 = the incoming batch
_WAVE_SQL = SA.md5_mod_sql("doc_id", 2)


def _incremental_minhash_oracle() -> str:
    mins, bands = _minhash_exprs()
    # asymmetric candidacy: doc_b is a NEW doc; doc_a is corpus (any) or an
    # EARLIER new doc — mirrors incremental_minhash_flags exactly
    band_joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM wb a JOIN wb b "
        f"ON a.band{b} = b.band{b} WHERE b.wave = 1 AND a.doc_id != b.doc_id "
        f"AND (a.wave = 0 OR a.doc_id < b.doc_id)"
        for b in range(_N_MINHASH // _BAND_SIZE)
    )
    return (
        _SHINGLE_CTE
        + f""",
waves AS (SELECT doc_id, {_WAVE_SQL} AS wave FROM documents),
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, {bands} FROM mh),
wb AS (SELECT b.*, w.wave FROM bands b JOIN waves w USING (doc_id)),
cand AS ({band_joins}),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS c
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY 1, 2
)
SELECT i.doc_b AS new_doc, i.doc_a AS matched_doc,
       round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard,
       CASE WHEN wa.wave = 0 THEN 'corpus' ELSE 'batch' END AS matched_in
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
JOIN waves wa ON wa.doc_id = i.doc_a
WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.8
"""
    )


def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-shaped near-dup: split documents into an already-ingested corpus
    (wave 0) and an incoming batch (wave 1) by a deterministic md5 parity;
    build the corpus LSH band state once (what an ingest pipeline appends
    per epoch), then flag batch docs against (a) the corpus state via a
    broadcast band join — one map-side corpus scan, no corpus shuffle —
    and (b) earlier docs of the same batch. Exact-Jaccard verified ≥ 0.8
    over a candidate-bounded corpus re-shingle (left-semi pushdown).
    Production operator: operators.dedup.incremental_minhash_flags."""
    docs = _t(spark, sf_dir, "documents")
    wave = SA.md5_mod_col("doc_id", 2)
    corpus = docs.filter(wave == 0)
    new_batch = docs.filter(wave == 1)
    state = D.minhash_band_state(
        corpus, n_hashes=_N_MINHASH, band_size=_BAND_SIZE
    )
    return D.incremental_minhash_flags(
        new_batch, corpus, state,
        threshold=0.8, n_hashes=_N_MINHASH, band_size=_BAND_SIZE,
    )


def _dedup_state_oracle() -> str:
    mins, bands = _minhash_exprs()
    # epoch of a flag = the wave of its NEW side; matched side is an
    # earlier wave ('corpus') or an earlier doc of the same wave ('batch').
    # "earlier doc" compares the STRING ids, because the persisted state
    # tables store doc_id as string (the engine's tie-break domain)
    band_joins = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM wb a JOIN wb b "
        f"ON a.band{b} = b.band{b} WHERE a.doc_id != b.doc_id "
        f"AND (a.wave < b.wave OR (a.wave = b.wave "
        f"AND CAST(a.doc_id AS VARCHAR) < CAST(b.doc_id AS VARCHAR)))"
        for b in range(_N_MINHASH // _BAND_SIZE)
    )
    return (
        _SHINGLE_CTE
        + f""",
waves AS (SELECT doc_id, {_WAVE_SQL} AS wave FROM documents),
mh AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, {bands} FROM mh),
wb AS (SELECT b.*, w.wave FROM bands b JOIN waves w USING (doc_id)),
cand AS ({band_joins}),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS c
  FROM cand c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b AND a.s = b.s
  GROUP BY 1, 2
)
SELECT CAST(i.doc_b AS VARCHAR) AS new_doc,
       CAST(i.doc_a AS VARCHAR) AS matched_doc,
       round(i.c * 1.0 / (sa.n + sb.n - i.c), 4) AS jaccard,
       CASE WHEN wa.wave < wb.wave THEN 'corpus' ELSE 'batch' END AS matched_in,
       CAST(wb.wave AS BIGINT) AS epoch
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
JOIN waves wa ON wa.doc_id = i.doc_a
JOIN waves wb ON wb.doc_id = i.doc_b
WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.8
"""
    )


def q_dedup_state_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest through the PERSISTED state tables
    (plans.dedup_ingest.DedupIngestState): documents arrive as two epochs
    (the deterministic md5-parity waves); each epoch flags its near-dups
    against the band state accumulated by the EARLIER epochs, then appends
    its own bands/docs/flags exactly-once. The returned DataFrame reads
    the durable flags TABLE — epoch 0 carries wave-0's internal pairs,
    epoch 1 carries wave-1-vs-corpus and wave-1-internal pairs."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import DedupIngestState

    docs = _t(spark, sf_dir, "documents")
    wave = SA.md5_mod_col("doc_id", 2)
    root = _swept_scratch_dir("dedupstate")
    state = DedupIngestState(
        spark, root, threshold=0.8, n_hashes=_N_MINHASH, band_size=_BAND_SIZE,
        n_buckets=8,
    )
    for epoch in (0, 1):
        state.apply(docs.filter(wave == epoch), batch_id=epoch)
    return state.all_flags()


# token-prefix fingerprint dedup: first 8 whitespace tokens, md5 over the
# JSON rendering of the prefix — injective (a separator join folds
# ["a,b"] onto ["a","b"] and drops nulls) and byte-identical between
# Spark's to_json and DuckDB's to_json (verified incl. commas, quotes,
# unicode, nulls); the slice is 1-based inclusive in both engines
_TOKEN_PREFIX_K = 8

_TOKEN_DEDUP_ORACLE = f"""
WITH f AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         {_WAVE_SQL} AS wave,
         md5(to_json(string_split(text, ' ')[1:{_TOKEN_PREFIX_K}])::VARCHAR) AS fp
  FROM documents
)
SELECT b.doc_id AS new_doc, a.doc_id AS matched_doc, a.fp AS fp,
       CASE WHEN a.wave < b.wave THEN 'corpus' ELSE 'batch' END AS matched_in,
       CAST(b.wave AS BIGINT) AS epoch
FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id <> b.doc_id
WHERE a.wave < b.wave OR (a.wave = b.wave AND a.doc_id < b.doc_id)
"""


def q_dedup_token_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT dedup-on-ingest for token payloads through the persisted
    fingerprint state (plans.dedup_ingest.TokenDedupState): documents
    arrive as two epochs (tokens = whitespace split of text); each epoch
    flags docs whose first-{k}-token fingerprint matches the corpus state
    or an earlier doc of the same epoch, then appends its fingerprints
    exactly-once. The fingerprint table stores no token bytes — the
    O(batch) probe shape a 10^10-sequence ingest loop needs."""
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    wave = SA.md5_mod_col("doc_id", 2)
    root = _swept_scratch_dir("tokdedup")
    state = TokenDedupState(spark, root, prefix_k=_TOKEN_PREFIX_K, n_buckets=8)
    for epoch in (0, 1):
        state.apply(docs.filter(wave == epoch), batch_id=epoch)
    return state.all_flags()


_STOPWORDS = TX.STOPWORDS  # the production constant — no drift
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in _STOPWORDS) + ")"

_TEXT_QUALITY_ORACLE = f"""
WITH words AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_words,
       round(n_chars * 1.0 / len(w), 4) AS chars_per_word,
       round(len(list_filter(w, x -> x IN {_SW_SQL})) * 1.0 / len(w), 4) AS stopword_ratio,
       CASE WHEN len(w) >= 20 AND len(list_filter(w, x -> x IN {_SW_SQL})) * 1.0 / len(w) > 0.01
            THEN 'good' ELSE 'low' END AS quality_label
FROM words
"""


def _corpus_curation_oracle() -> str:
    """The full curation flow in SQL: quality filter → minhash pairs over
    the SURVIVORS only → transitive closure → canonical flags. Reuses the
    shared minhash CTE chain with its document source swapped to the
    quality-filtered subset (one hash family, one source of truth)."""
    body = _minhash_cte(with_recursive=True).replace(
        "FROM documents", "FROM good"
    )
    good_cte = f"""WITH RECURSIVE qual AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '), x -> x IN {_SW_SQL})) * 1.0
           / len(string_split(text, ' ')) AS swr
  FROM documents
),
good AS (
  SELECT doc_id, text, n_words FROM qual
  WHERE n_words >= 20 AND swr > 0.01
),"""
    body = body.replace("WITH RECURSIVE words AS (", good_cte + "\nwords AS (")
    return (
        body
        + """,
pr AS (
  SELECT i.doc_a, i.doc_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.c * 1.0 / (sa.n + sb.n - i.c) >= 0.8
),
e AS (SELECT doc_a AS s, doc_b AS d FROM pr UNION SELECT doc_b, doc_a FROM pr),
reach AS (
  SELECT doc_id AS node, doc_id AS comp FROM good
  UNION
  SELECT e.d, r.comp FROM reach r JOIN e ON e.s = r.node
)
SELECT g.doc_id, CAST(g.n_words AS INTEGER) AS n_words,
       c.cluster_id, c.is_canonical
FROM good g
JOIN (
  SELECT node AS doc_id, min(comp) AS cluster_id,
         (node = min(comp)) AS is_canonical
  FROM reach GROUP BY node
) c USING (doc_id)
"""
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation flow END TO END in one plan: quality
    filter (Gopher-style length/stopword heuristics) → MinHash+LSH
    near-dup pairs over the survivors only (the filter prunes BEFORE the
    expensive shingle explode — order matters at 100 TB) → transitive
    cluster closure → one canonical doc per cluster.
    ``filter(is_canonical)`` is the corpus a tokenizer should see."""
    docs = _t(spark, sf_dir, "documents")
    good = (
        TX.quality_metrics(docs)
        .filter(F.col("quality_label") == "good")
        .select("doc_id", "text", "n_words")
    )
    pairs = D.minhash_lsh_pairs(
        good, threshold=0.8, n_hashes=_N_MINHASH, band_size=_BAND_SIZE
    )
    clusters = D.neardup_clusters(good, pairs)
    return good.join(clusters, "doc_id").select(
        "doc_id", "n_words", "cluster_id", "is_canonical"
    )


_REPETITION_ORACLE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
uni AS (SELECT doc_id, unnest(w) AS word FROM words),
cnt AS (SELECT doc_id, word, count(*) AS c FROM uni GROUP BY 1, 2),
top AS (SELECT doc_id, max(c) AS mc, sum(c) AS n FROM cnt GROUP BY 1),
bg AS (
  SELECT doc_id, len(w) - 1 AS nb,
         len(list_distinct([w[i] || ' ' || w[i + 1] for i in range(1, len(w))])) AS nbd
  FROM words
)
SELECT t.doc_id,
       CAST(t.n AS BIGINT) AS n_words,
       round(t.mc * 1.0 / t.n, 4) AS top_unigram_frac,
       round(CASE WHEN b.nb >= 1 THEN (b.nb - b.nbd) * 1.0 / b.nb ELSE 0.0 END, 4)
         AS dup_bigram_frac,
       CASE WHEN t.mc * 1.0 / t.n > 0.2
              OR (CASE WHEN b.nb >= 1 THEN (b.nb - b.nbd) * 1.0 / b.nb ELSE 0.0 END) > 0.3
            THEN 'repetitive' ELSE 'ok' END AS repetition_label
FROM top t JOIN bg b USING (doc_id)
"""


def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-unigram fraction (explode +
    two map-side-combined groupBys) and duplicate-bigram fraction
    (size − size(array_distinct) on the shingle array — no explode).
    Production operator: operators.text.repetition_metrics."""
    return TX.repetition_metrics(_t(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio heuristics, all JVM-side."""
    docs = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")
    sw = F.array(*[F.lit(x) for x in _STOPWORDS])
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    ratio = n_stop / n_words
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.col("n_chars") / n_words, 4).alias("chars_per_word"),
        F.round(ratio, 4).alias("stopword_ratio"),
        F.when((n_words >= 20) & (ratio > 0.01), "good").otherwise("low").alias("quality_label"),
    )


_LANG_WORDS = TX.LANG_MARKERS  # the production constant — no drift


def _lang_oracle() -> str:
    scores = ", ".join(
        "len(list_filter(w, x -> x IN ("
        + ", ".join(f"'{t}'" for t in toks)
        + f"))) AS s_{lang}"
        for lang, toks in _LANG_WORDS.items()
    )
    langs = list(_LANG_WORDS)
    best = "CASE "
    for lang in langs:
        others = [f"s_{lang} >= s_{o}" for o in langs if o != lang]
        best += f"WHEN s_{lang} > 0 AND {' AND '.join(others)} THEN '{lang}' "
    best += "ELSE 'unk' END"
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
scored AS (SELECT doc_id, {scores} FROM words)
SELECT doc_id, {best} AS pred_lang FROM scored
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax with deterministic
    first-wins tie-break (same CASE order as the oracle)."""
    docs = _t(spark, sf_dir, "documents")
    w = F.split("text", " ")

    def _score(toks: list[str]) -> F.Column:
        arr = F.array(*[F.lit(t) for t in toks])
        return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))

    scores = {lang: _score(toks) for lang, toks in _LANG_WORDS.items()}
    langs = list(_LANG_WORDS)
    expr = F.lit("unk")
    for lang in reversed(langs):
        cond = (scores[lang] > 0)
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    # reversed() + otherwise-chaining makes the FIRST language win ties,
    # matching the oracle's CASE order
    return docs.select("doc_id", expr.alias("pred_lang"))


_TOKEN_PATTERN = TX.TOKEN_PATTERN  # the production constant — no drift

_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{_TOKEN_PATTERN}')) AS re_tokens
FROM documents
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + BPE-ish regex tokenizer."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_PATTERN), F.lit(0))).alias("re_tokens"),
    )


_TOKEN_VOCAB_ORACLE = f"""
SELECT token, count(*) AS freq FROM (
  SELECT unnest(regexp_extract_all(lower(text), '{_TOKEN_PATTERN}')) AS token
  FROM documents
) GROUP BY token ORDER BY freq DESC, token LIMIT 100
"""


def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build: top-100 regex tokens by frequency
    (operators.text.token_vocab — explode, one combining count shuffle,
    TakeOrdered top-k)."""
    docs = _t(spark, sf_dir, "documents")
    return TX.token_vocab(docs, k=100)


_CHUNK_DOCS_ORACLE = f"""
WITH n AS (
  SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_PATTERN}')) AS n
  FROM documents
), e AS (
  SELECT doc_id, n, unnest(generate_series(0, (n - 1) // 48)) AS i
  FROM n WHERE n > 0
)
SELECT doc_id, i AS chunk_id, i * 48 AS tok_start,
       least(i * 48 + 64, n) AS tok_end,
       least(i * 48 + 64, n) - i * 48 AS chunk_tok
FROM e
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document sliding windows (64-token window, 48 stride — 16
    overlap): operators.packing.chunk_sliding over the regex token
    counts. Map-only (row-local sequence explode, no shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    counted = TX.token_counts(docs).select(
        "doc_id", F.col("re_tokens").alias("n_tok")
    )
    from data_hub_ejp_xml_pipeline_spark.operators.packing import chunk_sliding

    return chunk_sliding(counted, window=64, stride=48)


_FINGERPRINT_ORACLE = """
SELECT md5(regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized content hash
    (operators.text.fingerprint — explicit whitespace class, pinned
    identical in both regex engines: Java's \\s includes \\x0B, RE2's
    does not)."""
    from data_hub_ejp_xml_pipeline_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(fingerprint("text").alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id")
    )


_ANN_K = 5
_ANN_NQ = 8

_ANN_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < {_ANN_NQ}),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, e.embedding::DOUBLE[]), 6) AS sim6
  FROM q, embeddings e WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim6,
         row_number() OVER (PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank, round(sim6, 4) AS cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


# the PRODUCTION cosine — queries must exercise the shipped operator
from data_hub_ejp_xml_pipeline_spark.operators.similarity import cosine as _cosine


def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for a query set: broadcast the queries,
    score candidates with JVM-side higher-order functions, window top-k.
    Delegates to the PRODUCTION operator (similarity.ann_brute_force)."""
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import ann_brute_force

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_brute_force(emb, queries, k=_ANN_K)


_NEARDUP_COS_ORACLE = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.38
"""


_NEARDUP_MAX_VECS = 50_000


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold on rounded sim so both
    engines cut identically).

    VERIFY-ONLY: this is the O(n²) all-pairs oracle form, like its Jaccard
    sibling — at scale route candidates through ann_lsh / simhash banding
    first and rerank. Guarded: refuses to cross-join above
    ``_NEARDUP_MAX_VECS`` vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > _NEARDUP_MAX_VECS:
        raise ValueError(
            f"embedding_neardup is the quadratic verify-only form ({n} vectors "
            f"> {_NEARDUP_MAX_VECS}); use ann_lsh bucketing for candidate "
            "generation at scale"
        )
    a = emb.alias("a")
    b = emb.alias("b")
    raw = _cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            raw.alias("raw"),
        )
        # pair cut on round-6 (both engines agree to ~1e-9 on the raw
        # double, so the 6dp cut is stable); the REPORTED value rounds
        # ONCE from the raw double — round(round(x,6),4) double-rounds,
        # and any pair whose raw sits near a 0.5e-6 boundary then flips
        # its 4th decimal between engines (3 hits at sf0.1)
        .filter(F.round("raw", 6) >= 0.38)
        .select("vec_a", "vec_b", F.round("raw", 4).alias("cosine"))
    )


def _simhash_oracle() -> str:
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import SIMHASH_BITS

    bit_sums = ", ".join(
        f"sum(CASE WHEN (h & {1 << b}) > 0 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    return f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 4))::BIGINT AS h FROM words),
bits AS (SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM bits),
nib AS (
  SELECT doc_id, simhash, i AS nib_no, (simhash >> (4 * i)) & 15 AS nib
  FROM sig, LATERAL (SELECT unnest([0, 1, 2, 3]) AS i) t
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM nib a JOIN nib b
    ON a.nib_no = b.nib_no AND a.nib = b.nib AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit sign-sum signatures, nibble-band candidate
    generation (pigeonhole-complete for hamming ≤ 3), bit_count verify."""
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(_t(spark, sf_dir, "documents"))


_ANN_LSH_PLANES = 8
_ANN_LSH_DIM = 64


def _lsh_planes() -> list[list[float]]:
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import hyperplanes

    return hyperplanes(_ANN_LSH_PLANES, _ANN_LSH_DIM, seed=42)


def _ann_lsh_oracle(multiprobe: bool = False) -> str:
    """One generator for both probe modes — the Spark side is likewise one
    implementation (similarity.ann_lsh(multiprobe=...)), so the dataflows
    cannot drift apart."""
    planes = _lsh_planes()
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(e, {p!r}::DOUBLE[]) > 0 THEN {1 << j} ELSE 0 END)"
        for j, p in enumerate(planes)
    )
    if multiprobe:
        flips = ", ".join(["-1"] + [str(j) for j in range(len(planes))])
        q_cte = f"""q AS (
  SELECT query_id, qe,
         CASE WHEN j = -1 THEN bucket ELSE xor(bucket, CAST(1 << j AS BIGINT)) END
           AS bucket
  FROM (SELECT vec_id AS query_id, e AS qe, bucket FROM sig
        WHERE vec_id < {_ANN_NQ}) base,
       (SELECT unnest([{flips}]) AS j) flips
)"""
    else:
        q_cte = (
            f"q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM sig "
            f"WHERE vec_id < {_ANN_NQ})"
        )
    return f"""
WITH sig AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, CAST({bucket} AS BIGINT) AS bucket
  FROM embeddings
),
{q_cte},
scored AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.qe, s.e), 6) AS sim6
  FROM q JOIN sig s ON s.bucket = q.bucket AND s.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim6,
         row_number() OVER (PARTITION BY query_id ORDER BY sim6 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(sim6, 4) AS cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


_IVF_K = 8
_IVF_PROBE = 3
# sampled-training variant: md5-prefix basis points, portable across
# engines (functions.sampling owns the idiom)
_IVF_TRAIN_FRACTION = 0.5


def _ann_ivf_oracle(train_fraction: float = 1.0) -> str:
    train_where = (
        f"WHERE {SA.md5_mod_sql('vec_id', SA.SAMPLE_BASIS)} "
        f"< {SA.sample_threshold(train_fraction)}"
        if train_fraction < 1.0 else ""
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
train AS (SELECT * FROM e {train_where}),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS centroid
  FROM (SELECT * FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_K})
),
a1x AS (
  SELECT vec_id, cid FROM (
    SELECT t.vec_id, s.cid,
           row_number() OVER (PARTITION BY t.vec_id
             ORDER BY round(list_cosine_similarity(t.v, s.centroid), 6) DESC, s.cid
           ) AS rn
    FROM train t, seeds s) t WHERE rn = 1
),
dims AS (
  SELECT a.cid, u.pos, t.v[u.pos + 1] AS x
  FROM a1x a JOIN train t USING (vec_id),
       UNNEST(range(len(t.v))) AS u(pos)
),
cents AS (
  SELECT cid, array_agg(m ORDER BY pos) AS centroid
  FROM (SELECT cid, pos, round(avg(x), 9) AS m FROM dims GROUP BY 1, 2) d
  GROUP BY cid
),
lists AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.centroid), 6) DESC, c.cid
           ) AS rn
    FROM e, cents c) t WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qe FROM e WHERE vec_id < {_ANN_NQ}),
probes AS (
  SELECT query_id, qe, cid FROM (
    SELECT q.query_id, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qe, c.centroid), 6) DESC, c.cid
           ) AS rn
    FROM q, cents c) t WHERE rn <= {_IVF_PROBE}
),
scored AS (
  SELECT p.query_id, l.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.qe, e.v), 6) AS sim6
  FROM probes p JOIN lists l ON l.cid = p.cid AND l.vec_id <> p.query_id
  JOIN e ON e.vec_id = l.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim6,
         row_number() OVER (PARTITION BY query_id
           ORDER BY sim6 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(sim6, 4) AS cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic seed centroids + one Lloyd step → inverted
    lists; queries probe their n_probe nearest lists and rerank exactly.
    The complement of the LSH path (operators.similarity.ann_ivf)."""
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import ann_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_ivf(
        emb, queries, n_centroids=_IVF_K, n_probe=_IVF_PROBE, k=_ANN_K
    )


def q_ann_ivf_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the Lloyd refinement trained on a deterministic 50%
    md5-hash sample of the corpus — the 100 TB centroid-training shape
    (inverted lists still cover every vector; only the training pass is
    sampled). Same oracle pipeline with the sampled training set."""
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import ann_ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_ivf(
        emb, queries, n_centroids=_IVF_K, n_probe=_IVF_PROBE, k=_ANN_K,
        train_fraction=_IVF_TRAIN_FRACTION,
    )


def _ann_index_state_oracle() -> str:
    """Persistent-index semantics: centroids trained on the WAVE-0 corpus
    only and frozen; inverted lists cover ALL vectors (both epochs);
    probes + exact rerank as usual. neighbor_id is a VARCHAR (the state
    table's id domain), so the rank tie-break compares strings."""
    w0 = f"{SA.md5_mod_sql('vec_id', 2)} = 0"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
w0 AS (SELECT * FROM e WHERE {w0}),
seeds AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS centroid
  FROM (SELECT * FROM w0
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_IVF_K})
),
a1x AS (
  SELECT vec_id, cid FROM (
    SELECT t.vec_id, s.cid,
           row_number() OVER (PARTITION BY t.vec_id
             ORDER BY round(list_cosine_similarity(t.v, s.centroid), 6) DESC, s.cid
           ) AS rn
    FROM w0 t, seeds s) t WHERE rn = 1
),
dims AS (
  SELECT a.cid, u.pos, t.v[u.pos + 1] AS x
  FROM a1x a JOIN w0 t USING (vec_id),
       UNNEST(range(len(t.v))) AS u(pos)
),
cents AS (
  SELECT cid, array_agg(m ORDER BY pos) AS centroid
  FROM (SELECT cid, pos, round(avg(x), 9) AS m FROM dims GROUP BY 1, 2) d
  GROUP BY cid
),
lists AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.v, c.centroid), 6) DESC, c.cid
           ) AS rn
    FROM e, cents c) t WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qe FROM e WHERE vec_id < {_ANN_NQ}),
probes AS (
  SELECT query_id, qe, cid FROM (
    SELECT q.query_id, q.qe, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_cosine_similarity(q.qe, c.centroid), 6) DESC, c.cid
           ) AS rn
    FROM q, cents c) t WHERE rn <= {_IVF_PROBE}
),
scored AS (
  SELECT p.query_id, CAST(l.vec_id AS VARCHAR) AS neighbor_id,
         round(list_cosine_similarity(p.qe, e.v), 6) AS sim6
  FROM probes p JOIN lists l ON l.cid = p.cid AND l.vec_id <> p.query_id
  JOIN e ON e.vec_id = l.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim6,
         row_number() OVER (PARTITION BY query_id
           ORDER BY sim6 DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, round(sim6, 4) AS cosine
FROM ranked WHERE rank <= {_ANN_K}
"""


def q_ann_index_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN served from the PERSISTENT index (plans.ann_index.
    IvfIndexState): centroids trained once on the wave-0 corpus and
    frozen; the wave-0 and wave-1 epochs appended to the cid-bucketed
    inverted-lists table exactly-once; queries probe their n_probe
    nearest centroids and scan ONLY the probed lists' bucket files
    (manifest-level file pruning — the growth path a serving index
    needs)."""
    from data_hub_ejp_xml_pipeline_spark.plans.ann_index import IvfIndexState

    emb = _t(spark, sf_dir, "embeddings")
    wave = SA.md5_mod_col("vec_id", 2)
    root = _swept_scratch_dir("annidx")
    idx = IvfIndexState(spark, root, n_centroids=_IVF_K, n_buckets=8)
    idx.train(emb.filter(wave == 0))
    idx.apply(emb.filter(wave == 0), batch_id=0)
    idx.apply(emb.filter(wave == 1), batch_id=1)
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return idx.query(queries, k=_ANN_K, n_probe=_IVF_PROBE)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: signature-bucket join + exact rerank —
    the scale path (one shuffle on the bucket instead of a cross product)."""
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import ann_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_lsh(emb, queries, _lsh_planes(), k=_ANN_K)


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH ANN: the query also probes every 1-bit flip of its
    signature (H+1 probes), recovering near-boundary neighbors — the
    standard recall fix over single-bucket LSH at the cost of H extra
    broadcast rows per query."""
    from data_hub_ejp_xml_pipeline_spark.operators.similarity import ann_lsh

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_lsh(emb, queries, _lsh_planes(), k=_ANN_K, multiprobe=True)


_PII_ORACLE = """
WITH r AS (
  SELECT doc_id, text,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g')
           AS after_email
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS n_emails,
  len(regexp_extract_all(after_email, '[0-9]{9,}')) AS n_long_numbers,
  md5(regexp_replace(after_email, '[0-9]{9,}', '<NUM>', 'g')) AS redacted_fp
FROM r
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass: per-doc email / long-number counts + redacted
    fingerprint (operators.text.pii_scrub — single JVM regex pass)."""
    from data_hub_ejp_xml_pipeline_spark.operators.text import pii_scrub

    return pii_scrub(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_emails", "n_long_numbers", "redacted_fp"
    )


_SPLIT_ORACLE = """
SELECT doc_id,
  CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 100 < 10
       THEN 'val' ELSE 'train' END AS split
FROM documents
"""


def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-hash split assignment — a document never migrates
    between train/val across runs or engines."""
    from data_hub_ejp_xml_pipeline_spark.operators.text import train_val_split

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", train_val_split("doc_id").alias("split"))


_DECONTAMINATE_ORACLE = (
    _SHINGLE_CTE
    + """,
probe AS (
  SELECT DISTINCT s FROM sh
  WHERE doc_id = (SELECT min(doc_id) FROM documents)
)
SELECT sh.doc_id, count(*) AS n_hits
FROM sh JOIN probe USING (s)
GROUP BY 1
"""
)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: documents sharing ≥1 3-gram with the
    probe set (here: the lowest-id document's shingles, standing in for an
    eval set). Probe broadcast; corpus side shuffles only its own
    exploded shingles."""
    from data_hub_ejp_xml_pipeline_spark.operators.text import contaminated_docs

    docs = _t(spark, sf_dir, "documents")
    min_id = docs.agg(F.min("doc_id")).first()[0]
    probe = (
        docs.filter(F.col("doc_id") == min_id)
        .select(F.explode(_shingles(F.split("text", " "))).alias("s"))
        .distinct()
    )
    return contaminated_docs(docs, probe)


_MULTIMODAL_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       length(text) AS n_chars_exact
FROM documents
"""


_PACK_MAX_TOKENS = 512  # power of two → fill_ratio rounds identically

_SEQUENCE_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source AS grp, len(string_split(text, ' ')) AS n_tok
  FROM documents
), laid AS (
  SELECT grp, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS g_start
  FROM toks WHERE n_tok > 0
), spans AS (
  SELECT grp, doc_id, n_tok, g_start,
         unnest(generate_series(
           CAST(floor(g_start / {_PACK_MAX_TOKENS}) AS BIGINT),
           CAST(floor((g_start + n_tok - 1) / {_PACK_MAX_TOKENS}) AS BIGINT)
         )) AS chunk_id
  FROM laid
)
SELECT grp AS "group", chunk_id, count(*) AS n_docs,
       CAST(sum(least(chunk_id * {_PACK_MAX_TOKENS} + {_PACK_MAX_TOKENS}, g_start + n_tok)
           - greatest(chunk_id * {_PACK_MAX_TOKENS}, g_start)) AS BIGINT) AS n_tokens,
       round(sum(least(chunk_id * {_PACK_MAX_TOKENS} + {_PACK_MAX_TOKENS}, g_start + n_tok)
           - greatest(chunk_id * {_PACK_MAX_TOKENS}, g_start)) / {_PACK_MAX_TOKENS}.0, 4)
         AS fill_ratio
FROM spans GROUP BY 1, 2
"""


_SEQUENCE_PACK_GREEDY_ORACLE = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source AS grp, len(string_split(text, ' ')) AS n_tok
  FROM documents
), ordered AS (
  SELECT grp, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
  FROM toks WHERE n_tok > 0
), packed AS (
  SELECT grp, doc_id, n_tok, rn,
         CAST(0 AS BIGINT) AS seq_id, n_tok AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.doc_id, o.n_tok, o.rn,
         CASE WHEN p.fill + o.n_tok > {_PACK_MAX_TOKENS}
              THEN p.seq_id + 1 ELSE p.seq_id END AS seq_id,
         CASE WHEN p.fill + o.n_tok > {_PACK_MAX_TOKENS}
              THEN o.n_tok ELSE p.fill + o.n_tok END AS fill
  FROM packed p JOIN ordered o ON o.grp = p.grp AND o.rn = p.rn + 1
)
SELECT grp AS "group", seq_id, count(*) AS n_docs,
       CAST(max(fill) AS BIGINT) AS n_tokens
FROM packed GROUP BY 1, 2
"""


_SEQUENCE_PACK_TOKENS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source AS grp, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
), laid AS (
  SELECT grp, doc_id, toks, n_tok,
         sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS g_start
  FROM toks WHERE n_tok > 0
), spans AS (
  SELECT grp, doc_id, toks, n_tok, g_start,
         unnest(generate_series(
           CAST(floor(g_start / {_PACK_MAX_TOKENS}) AS BIGINT),
           CAST(floor((g_start + n_tok - 1) / {_PACK_MAX_TOKENS}) AS BIGINT)
         )) AS chunk_id
  FROM laid
), pieces AS (
  SELECT grp, chunk_id, doc_id,
         list_slice(toks,
           CAST(greatest(chunk_id * {_PACK_MAX_TOKENS}, g_start) - g_start + 1 AS BIGINT),
           CAST(least(chunk_id * {_PACK_MAX_TOKENS} + {_PACK_MAX_TOKENS}, g_start + n_tok)
                - g_start AS BIGINT)) AS piece
  FROM spans
)
SELECT grp AS "group", chunk_id, count(*) AS n_docs,
       CAST(sum(len(piece)) AS INT) AS n_tokens,
       md5(string_agg(array_to_string(piece, ' '), ' ' ORDER BY doc_id)) AS chunk_md5
FROM pieces GROUP BY 1, 2
"""


def q_sequence_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-LEVEL packing proof: assemble the actual packed sequences
    (``operators.packing.pack_chunked_sequences`` — window layout + slice
    + ordered flatten, no Python) and checksum each chunk's token stream;
    the oracle rebuilds every chunk's concat-in-doc-order token string in
    SQL. Matching md5s pin per-token content AND order, not just counts."""
    from data_hub_ejp_xml_pipeline_spark.operators.packing import (
        pack_chunked_sequences,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("tokens")
    )
    packed = pack_chunked_sequences(
        docs, _PACK_MAX_TOKENS, id_col="doc_id", tokens_col="tokens",
        group_col="source",
    )
    return packed.select(
        "group",
        "chunk_id",
        "n_docs",
        "n_tokens",
        F.md5(F.concat_ws(" ", "tokens")).alias("chunk_md5"),
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-then-chunk) of tokenized docs
    into fixed 512-token (``_PACK_MAX_TOKENS``) training sequences: per-chunk doc
    count, token count, fill ratio. Pure window+explode — one shuffle per
    group, whole-stage codegen (operators.packing.pack_chunked)."""
    from data_hub_ejp_xml_pipeline_spark.operators.packing import pack_chunked_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    return pack_chunked_stats(
        docs, _PACK_MAX_TOKENS, id_col="doc_id", n_tok_col="n_tok",
        group_col="source",
    )


def q_sequence_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy next-fit packing of WHOLE documents (grouped-map pandas
    kernel — the sequential recurrence is per group). Oracle: a DuckDB
    RECURSIVE CTE stepping one document per iteration per group, which
    expresses the fill/reset recurrence exactly; a pytest python oracle
    pins it a second way."""
    from data_hub_ejp_xml_pipeline_spark.operators.packing import pack_greedy

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    packed = pack_greedy(
        docs, _PACK_MAX_TOKENS, id_col="doc_id", n_tok_col="n_tok",
        group_col="source",
    )
    return packed.groupBy("group", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("seq_used_tokens").alias("n_tokens"),
    )


_ENTITY_TYPED_ORACLE = """
SELECT 'person_v2:p' || CAST(doc_id AS VARCHAR) AS doc_id,
       string_split(text, ' ')[1] AS first_name,
       source AS last_name,
       CAST(least(len(string_split(text, ' ')), 3) AS INT) AS n_tags,
       CASE WHEN doc_id % 2 = 0
            THEN 'd' || CAST(doc_id AS VARCHAR) || '@example.org' END AS email,
       CASE WHEN doc_id % 2 = 0
            THEN 'city' || CAST(doc_id % 7 AS VARCHAR) END AS city,
       CASE WHEN doc_id % 2 = 0 THEN '2020-01-05T08:04:05Z'
            ELSE '2020-01-02T08:04:05Z' END AS modified_timestamp
FROM documents
"""


def q_entity_tables_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole data path as ONE driver-checked query:
    documents rows are rendered into reference-vocabulary person XML
    (ejp_person_xml.py fields), zipped distributed (one zip per hash
    bucket via applyInPandas), read back through the binaryFile →
    mapInPandas zip parser, fanned through
    ``EntityPipeline(payload_mode='typed')`` in two waves — the second
    wave introduces ``addresses``/``email``, so the person_v2 table's
    schema EVOLVES additively mid-query — and the final typed nested
    projection (array<struct> address city, tag count) must reproduce the
    SQL oracle computed directly on ``documents``. Odd doc_ids travel in
    wave 0 (base fields), even in wave 1 (extended fields); each doc
    appears exactly once, so LWW is exercised only by the engine plumbing,
    not contended."""
    import pandas as pd

    from data_hub_ejp_xml_pipeline_spark.config import PipelineConfig
    from data_hub_ejp_xml_pipeline_spark.plans.entity_pipeline import EntityPipeline
    from data_hub_ejp_xml_pipeline_spark.sources.xml_zip import (
        entities_to_changelog,
        read_zip_entities,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    n_docs = docs.count()
    n_zips = max(8, min(64, n_docs // 300))
    scratch = _swept_scratch_dir("entq")
    for w in (0, 1):
        os.makedirs(os.path.join(scratch, f"wave{w}"), exist_ok=True)

    staged = docs.select(
        "doc_id", "text", "source",
        (1 - F.pmod("doc_id", F.lit(2))).cast("int").alias("wave"),
        F.pmod("doc_id", F.lit(n_zips)).cast("int").alias("zip_id"),
    )

    def build_zip(pdf: pd.DataFrame) -> pd.DataFrame:
        import io
        import zipfile
        from xml.sax.saxutils import escape

        wave = int(pdf["wave"].iloc[0])
        zid = int(pdf["zip_id"].iloc[0])
        mdate = "2020-01-05 03:04:05" if wave == 1 else "2020-01-02 03:04:05"
        parts = []
        for r in pdf.sort_values("doc_id").itertuples():
            toks = r.text.split(" ")
            tags = "".join(
                f"<person-tag>{escape(t)}</person-tag>" for t in toks[:3]
            )
            extra = ""
            if wave == 1:
                extra = (
                    f"<email>d{r.doc_id}@example.org</email>"
                    '<addresses><address active_ind="1">'
                    f"<country>{escape(r.source)}</country>"
                    f"<city>city{r.doc_id % 7}</city></address></addresses>"
                )
            parts.append(
                f"<person><person-id>p{r.doc_id}</person-id>"
                f"<first-name>{escape(toks[0])}</first-name>"
                f"<last-name>{escape(r.source)}</last-name>"
                f"<profile-modify-date>{mdate}</profile-modify-date>"
                f"<person-tags>{tags}</person-tags>{extra}</person>"
            )
        xml = ("<persons>" + "".join(parts) + "</persons>").encode()
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(
                "go.xml",
                b'<go create_date="2020-03-03 00:00:00">'
                b"<file_nm>p.xml</file_nm></go>",
            )
            zf.writestr("p.xml", xml)
        with open(os.path.join(scratch, f"wave{wave}", f"z{zid}.zip"), "wb") as fh:
            fh.write(buf.getvalue())
        return pd.DataFrame({"wave": [wave], "zip_id": [zid], "n": [len(pdf)]})

    # one zip per (wave, bucket) — written by the executors (local mode:
    # shared tmpfs; cluster: point scratch at a shared filesystem)
    staged.groupBy("wave", "zip_id").applyInPandas(
        build_zip, "wave int, zip_id int, n long"
    ).collect()

    cfg = PipelineConfig(
        zip_path=scratch, warehouse_root=os.path.join(scratch, "wh")
    )
    pipe = EntityPipeline(spark, cfg, n_buckets=8, payload_mode="typed")
    for w in (0, 1):
        ents = read_zip_entities(spark, os.path.join(scratch, f"wave{w}"))
        pipe.apply(entities_to_changelog(ents), batch_id=w)

    return pipe.read("person_v2").select(
        "doc_id",
        "first_name",
        "last_name",
        F.size("person_tags").alias("n_tags"),
        "email",
        F.col("addresses")[0]["city"].alias("city"),
        "modified_timestamp",
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: opaque binary payload column + typed metadata
    (decode itself is stubbed — see operators.multimodal)."""
    docs = _t(spark, sf_dir, "documents")
    blob = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("n_bytes"),
        F.length("text").alias("n_chars_exact"),
    )


# BMPs synthesized deterministically from documents.n_chars: seed-driven
# size and a linear-congruential gray ramp, so a SQL oracle can predict
# exactly what a REAL byte-level decode of the generated file must report
# (dimensions from the parsed header, checksum from the parsed pixels).
_BMP_W = "4 + n_chars % 5"
_BMP_H = "3 + n_chars % 4"

_MULTIMODAL_DECODE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars AS seed, {_BMP_W} AS w, {_BMP_H} AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         (seed * 7 + unnest(generate_series(0, w * h - 1)) * 13) % 256 AS v
  FROM d
)
SELECT
  CAST(doc_id AS VARCHAR)                    AS media_id,
  'bmp'                                      AS format,
  CAST(w AS INTEGER)                         AS width,
  CAST(h AS INTEGER)                         AS height,
  -- 54-byte headers + 4-byte-padded BGR rows: the REAL file size
  CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INTEGER) AS n_bytes,
  CAST(w * h * 3 AS INTEGER)                 AS n_values,
  CAST(3 * sum(v) AS BIGINT)                 AS sum_values
FROM px
GROUP BY doc_id, w, h
"""


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize a deterministic 24-bit BMP
    per document (pure-Python encoder, operators.codecs), then recover
    dimensions + pixel checksum by PARSING the bytes back
    (operators.multimodal.decode_stats — strict path, no fake decode).
    The oracle predicts header size, dimensions, and checksum from the
    generating formula — so a decoder bug (padding, BGR order, bottom-up
    rows) breaks the hash match. Both stages are Arrow-batched
    mapInPandas, partition-local, no shuffle."""
    import numpy as np
    import pandas as pd

    from data_hub_ejp_xml_pipeline_spark.operators import codecs
    from data_hub_ejp_xml_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_stats,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def synth(batches):
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "payload": [], "meta": []}
            for doc_id, seed in zip(pdf["doc_id"], pdf["n_chars"]):
                seed = int(seed)
                w, h = 4 + seed % 5, 3 + seed % 4
                v = (seed * 7 + np.arange(w * h, dtype=np.int64) * 13) % 256
                img = np.repeat(v, 3).reshape(h, w, 3).astype(np.uint8)
                payload = codecs.encode_bmp(img)
                out["media_id"].append(str(doc_id))
                out["media_type"].append("image")
                out["payload"].append(payload)
                out["meta"].append(
                    {"n_bytes": len(payload), "format": "bmp", "width": w, "height": h}
                )
            yield pd.DataFrame(out)

    media = docs.mapInPandas(synth, schema=MEDIA_SCHEMA)
    return decode_stats(media)


# ---------------------------------------------------------------------
# Row-level DML (predicate DELETE / UPDATE on the snapshot table)
# ---------------------------------------------------------------------

_DML_BASE = """
  SELECT CAST(user_id AS VARCHAR) AS doc_id,
         event_type AS final_event_type,
         round(value, 4) AS final_value,
         event_id AS last_lsn
  FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1 AND event_type <> 'error'
"""

_DELETE_WHERE_ORACLE = f"""
SELECT * FROM ({_DML_BASE})
WHERE final_value < 150
"""

_UPDATE_WHERE_ORACLE = f"""
SELECT doc_id,
       CASE WHEN final_event_type = 'signup' THEN 'signup_bulk'
            ELSE final_event_type END AS final_event_type,
       CASE WHEN final_event_type = 'signup' THEN round(final_value * 2, 4)
            ELSE final_value END AS final_value,
       last_lsn
FROM ({_DML_BASE})
"""


def _dml_base_table(spark: SparkSession, sf_dir: str, prefix: str):
    """events → 2 incremental merges into a fresh SnapshotTable (the
    shared setup for the DML queries; same shape as cdc_engine_final_state)."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    changelog = ev.select(
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("final_event_type"),
        F.round("value", 4).alias("final_value"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("final_event_type", T.StringType()),
            T.StructField("final_value", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir(prefix) + "/tbl"
    table = SnapshotTable.create(spark, root, payload, key="doc_id", n_buckets=8)
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 2 + 1, 1)
    for i in range(2):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        table.merge(reduce_latest(batch), batch_id=i)
    return table


def q_cdc_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE end-to-end: events applied through the REAL table,
    then ``delete_where('final_value >= 150')`` (soft tombstones, matched
    files only rewritten) — the surviving state must equal the one-shot
    LWW view minus the predicate's rows."""
    table = _dml_base_table(spark, sf_dir, "delq")
    table.delete_where("final_value >= 150", batch_id=2)
    return table.read().select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


def q_cdc_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE end-to-end: ``update_where`` rewrites matching
    rows' values (LSN untouched) in matched files only; result must equal
    the LWW view with the CASE applied."""
    table = _dml_base_table(spark, sf_dir, "updq")
    table.update_where(
        "final_event_type = 'signup'",
        {
            "final_value": F.round(F.col("final_value") * 2, 4),
            "final_event_type": "signup_bulk",
        },
        batch_id=2,
    )
    return table.read().select(
        "doc_id", "final_event_type", "final_value", F.col("_lsn").alias("last_lsn")
    )


# ---------------------------------------------------------------------
# Debezium schema drift (upstream DDL → table evolution)
# ---------------------------------------------------------------------

_SCHEMA_DRIFT_ORACLE = """
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS etype,
       round(value, 4) AS val,
       CASE WHEN event_id >= (SELECT (max(event_id) + 1) // 2 FROM events)
            THEN event_id * 3 END AS score,
       event_id AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upstream-DDL loop end-to-end: events rendered as Debezium JSON
    envelopes where a ``score`` column appears on the wire only in the
    second half of the stream (``to_json`` drops null fields, exactly
    like a connector after an ALTER TABLE). Epoch 1 decodes with the
    declared schema; epoch 2 is drift-scanned (``drift_columns``), the
    schema evolves off a bounded sample (``evolve_payload_schema``), the
    re-decode carries the column and the table merge's create-or-evolve
    adds it — old rows read NULL. Final state vs the one-shot LWW view."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
    from data_hub_ejp_xml_pipeline_spark.sources import debezium as dbz
    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    ev = _t(spark, sf_dir, "events")
    lo, hi = _event_id_bounds(spark, sf_dir)
    mid = (hi + 1) // 2
    eid = F.col("event_id")
    is_err = F.col("event_type") == "error"
    payload = F.struct(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("etype"),
        F.round("value", 4).alias("val"),
        F.when(eid >= mid, eid * 3).alias("score"),
    )
    envelopes = ev.select(
        eid.alias("event_id"),
        F.to_json(
            F.struct(
                F.when(is_err, payload).alias("before"),
                F.when(~is_err, payload).alias("after"),
                F.when(is_err, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                (eid + F.lit(1_700_000_000_000)).alias("ts_ms"),
                F.struct(eid.alias("lsn"), F.lit("events").alias("table")).alias("source"),
            )
        ).alias("value"),
    )
    base = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    # each epoch's envelope frame feeds two consumers (merge decode +
    # drift scan / schema evolution) — cache the rendered JSON strings so
    # the to_json pass over the parquet scan runs once per epoch, not per
    # consumer (the decode itself executes once per merge via the
    # commit's own batch cache)
    epoch1 = envelopes.filter(eid < mid).persist()
    epoch2 = envelopes.filter(eid >= mid).persist()
    try:
        root = _swept_scratch_dir("driftq") + "/tbl"
        table = SnapshotTable.create(spark, root, base, key="doc_id", n_buckets=8)
        table.merge(
            reduce_latest(dbz.changelog(dbz.decode_envelopes(epoch1, base))),
            batch_id=0,
        )
        if dbz.drift_columns(epoch1, base).count() != 0:
            raise AssertionError("epoch 1 must be drift-free")
        evolved = dbz.evolve_payload_schema(spark, epoch2, base)
        if evolved is base:
            raise AssertionError("epoch 2 must have drifted")
        table.merge(
            reduce_latest(dbz.changelog(dbz.decode_envelopes(epoch2, evolved))),
            batch_id=1,
        )
    finally:
        epoch1.unpersist()
        epoch2.unpersist()
    return table.read().select(
        "doc_id", "etype", "val", "score", F.col("_lsn").alias("last_lsn")
    )


# ---------------------------------------------------------------------
# Multi-table routing (one WAL tail → many tables)
# ---------------------------------------------------------------------

_MULTI_TABLE_ORACLE = """
SELECT CASE WHEN user_id % 2 = 0 THEN 'evens' ELSE 'odds' END AS tbl,
       CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS etype,
       round(value, 4) AS val,
       event_id AS last_lsn
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-connector-many-tables: events rendered as a MIXED Debezium
    envelope stream (source.table = evens/odds by key parity) applied
    through MultiTablePipeline in 2 epochs — route by table, decode per
    schema, merge per table under one batch_id. The union of the two
    final states must equal the one-shot LWW view split by parity."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.multi_table import MultiTablePipeline

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id")
    is_err = F.col("event_type") == "error"
    payload = F.struct(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("event_type").alias("etype"),
        F.round("value", 4).alias("val"),
    )
    envelopes = ev.select(
        eid.alias("event_id"),
        F.to_json(
            F.struct(
                F.when(is_err, payload).alias("before"),
                F.when(~is_err, payload).alias("after"),
                F.when(is_err, F.lit("d")).otherwise(F.lit("u")).alias("op"),
                (eid + F.lit(1_700_000_000_000)).alias("ts_ms"),
                F.struct(
                    eid.alias("lsn"),
                    F.when(F.col("user_id") % 2 == 0, F.lit("evens"))
                    .otherwise(F.lit("odds"))
                    .alias("table"),
                ).alias("source"),
            )
        ).alias("value"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    root = _swept_scratch_dir("multiq")
    pipe = MultiTablePipeline(
        spark, root, {"evens": schema, "odds": schema}, n_buckets=4
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 2 + 1, 1)
    for i in range(2):
        batch = envelopes.filter(
            (eid >= lo + i * step) & (eid < lo + (i + 1) * step)
        ).select("value")
        pipe.apply(batch, batch_id=i)
    parts = [
        pipe.pipes[t].table.read().select(
            F.lit(t).alias("tbl"), "doc_id", "etype", "val",
            F.col("_lsn").alias("last_lsn"),
        )
        for t in ("evens", "odds")
    ]
    return parts[0].unionByName(parts[1])


# ---------------------------------------------------------------------
# Partial updates (unchanged-TOAST placeholder resolution)
# ---------------------------------------------------------------------

_PARTIAL_ORACLE = """
WITH chg AS (
  SELECT event_id AS lsn,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error'  THEN 'D'
              ELSE 'U' END AS op,
         CAST(user_id AS VARCHAR) AS doc_id,
         CASE WHEN event_type NOT IN ('signup', 'error') AND event_id % 3 = 0
                THEN '__unavailable__'
              WHEN event_id % 7 = 0 THEN NULL
              ELSE 'a' || CAST(event_id AS VARCHAR) END AS a,
         CASE WHEN event_type NOT IN ('signup', 'error') AND event_id % 5 = 0
                THEN '__unavailable__'
              WHEN event_id % 11 = 0 THEN NULL
              ELSE event_type || CAST(event_id AS VARCHAR) END AS b
  FROM events
),
marked AS (
  SELECT *,
         sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY lsn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dseg
  FROM chg
),
tot AS (
  SELECT doc_id, max(dseg) AS total_d, max(lsn) AS last_lsn,
         arg_max(op, lsn) AS last_op
  FROM marked GROUP BY doc_id
),
-- the sequential fold, restricted to events after the key's last D:
-- a column's final value comes from the newest event that SET it (any I,
-- or a U whose value is not the placeholder; explicit NULL is a real
-- value, hence the struct_pack shield around arg_max's NULL-skipping)
folded AS (
  SELECT m.doc_id,
         arg_max(struct_pack(v := m.a),
                 CASE WHEN m.a IS NULL OR m.a <> '__unavailable__'
                      THEN m.lsn END) AS fa,
         arg_max(struct_pack(v := m.b),
                 CASE WHEN m.b IS NULL OR m.b <> '__unavailable__'
                      THEN m.lsn END) AS fb
  FROM marked m JOIN tot t USING (doc_id)
  WHERE m.op <> 'D' AND m.dseg = t.total_d
  GROUP BY m.doc_id
)
SELECT t.doc_id, f.fa.v AS a, f.fb.v AS b, t.last_lsn
FROM tot t LEFT JOIN folded f USING (doc_id)
WHERE t.last_op <> 'D'
"""


# the production epoch, oracle-checked: routing × wire drift × wire DLQ
# × SCD2 × IVM in one MultiTablePipeline. Dirty events (every 37th: null
# key; every 53rd: unknown op) are quarantined at decode and excluded
# from the clean LWW; evens gain `score` on the wire from the second
# epoch on (auto-evolve adds the column, pre-drift rows read NULL).
_KITCHEN_SINK_ORACLE = """
WITH b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM events),
p AS (SELECT lo + (hi - lo + 1) // 2 + 1 AS drift_at FROM b),
clean AS (
  SELECT * FROM events WHERE event_id % 37 <> 0 AND event_id % 53 <> 0
),
w AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM clean
)
SELECT CASE WHEN user_id % 2 = 0 THEN 'evens' ELSE 'odds' END AS tbl,
       CAST(user_id AS VARCHAR) AS doc_id,
       event_type AS etype,
       round(value, 4) AS val,
       CASE WHEN user_id % 2 = 0 AND event_id >= (SELECT drift_at FROM p)
            THEN event_id * 3 END AS score,
       event_id AS last_lsn
FROM w WHERE rn = 1 AND event_type <> 'error'
"""


def q_cdc_kitchen_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production epoch as ONE oracle-checked query: events
    rendered as a mixed Debezium stream with dirty envelopes (null keys,
    unknown ops) and mid-stream wire drift, applied in 2 epochs through
    ``MultiTablePipeline(auto_evolve=True, wire_dlq=..., pipeline_kwargs
    ={evens: scd2, odds: ivm})``. The union of the two final states must
    equal the clean LWW view split by parity with the drifted column;
    in-query raises turn a sidecar that silently stopped firing (empty
    quarantine, no closed history, diverged IVM totals) into a driver
    'err'. The crash/restart form of the same composition is pinned by
    ``tests/test_streaming_states.py``."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.dlq import DlqState
    from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState
    from data_hub_ejp_xml_pipeline_spark.plans.multi_table import MultiTablePipeline
    from data_hub_ejp_xml_pipeline_spark.plans.scd2 import Scd2State

    ev = _t(spark, sf_dir, "events")
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 2 + 1, 1)
    drift_at = lo + step
    eid = F.col("event_id")
    is_err = F.col("event_type") == "error"
    is_even = F.col("user_id") % 2 == 0
    payload = F.struct(
        F.when(eid % 37 != 0, F.col("user_id").cast("string")).alias("doc_id"),
        F.col("event_type").alias("etype"),
        F.round("value", 4).alias("val"),
        F.when(is_even & ~is_err & (eid >= drift_at), eid * 3).alias("score"),
    )
    envelopes = ev.select(
        eid.alias("event_id"),
        F.to_json(
            F.struct(
                F.when(is_err, payload).alias("before"),
                F.when(~is_err, payload).alias("after"),
                F.when(eid % 53 == 0, F.lit("x"))
                .when(is_err, F.lit("d"))
                .otherwise(F.lit("u"))
                .alias("op"),
                (eid + F.lit(1_700_000_000_000)).alias("ts_ms"),
                F.struct(
                    eid.alias("lsn"),
                    F.when(is_even, F.lit("evens")).otherwise(F.lit("odds"))
                    .alias("table"),
                ).alias("source"),
            )
        ).alias("value"),
    )
    base = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("etype", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    dlq_payload = T.StructType(
        [T.StructField("tbl", T.StringType()), T.StructField("raw", T.StringType())]
    )
    root = _swept_scratch_dir("sinkq")
    scd2 = Scd2State(spark, root + "/scd2", payload_schema=base, n_buckets=4)
    ivm = IncrementalAggState(spark, root + "/ivm", group_col="etype",
                              value_col="val")
    dlq = DlqState(spark, root + "/dlq", payload_schema=dlq_payload, n_buckets=4)
    pipe = MultiTablePipeline(
        spark, root + "/mt", {"evens": base, "odds": base}, n_buckets=4,
        auto_evolve=True, wire_dlq=dlq,
        pipeline_kwargs={"evens": {"scd2_state": scd2},
                         "odds": {"ivm_state": ivm}},
    )
    for i in range(2):
        batch = envelopes.filter(
            (eid >= lo + i * step) & (eid < lo + (i + 1) * step)
        ).select("value")
        pipe.apply(batch, batch_id=i)

    reasons = {r.reject_reason for r in dlq.counts_by_reason().collect()}
    if not any("null key" in r for r in reasons):
        raise AssertionError("wire DLQ saw no null-key rejects")
    if not any("unknown op" in r for r in reasons):
        raise AssertionError("wire DLQ saw no unknown-op rejects")
    evens = pipe.pipes["evens"].table.read()
    if "score" not in evens.columns:
        raise AssertionError("wire drift did not evolve the evens table")
    if scd2.read_history().filter("NOT is_current").count() == 0:
        raise AssertionError("SCD2 closed no versions across the epochs")
    odds = pipe.pipes["odds"].table.read()
    recomputed = {
        tuple(r) for r in odds.groupBy("etype").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("val"), 6).alias("t")).collect()
    }
    got = {
        tuple(r) for r in ivm.read_totals().select(
            "etype", "cnt", F.round("total", 6).alias("t")).collect()
    }
    if got != recomputed:
        raise AssertionError("IVM totals diverged from the odds base")
    parts = [
        evens.select(F.lit("evens").alias("tbl"), "doc_id", "etype", "val",
                     "score", F.col("_lsn").alias("last_lsn")),
        odds.select(F.lit("odds").alias("tbl"), "doc_id", "etype", "val",
                    F.lit(None).cast("long").alias("score"),
                    F.col("_lsn").alias("last_lsn")),
    ]
    return parts[0].unionByName(parts[1])


def q_partial_update_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unchanged-TOAST resolution end-to-end: events → a partial-update
    changelog (signup ⇒ I, error ⇒ D, else U; deterministic event_id
    residues plant ``__unavailable__`` placeholders and explicit NULLs on
    U events) applied through the REAL MergePipeline in 3 incremental
    epochs with ``placeholder_cols`` — in-batch window resolution plus
    pre-epoch table fill (operators/partial.py). The final table must
    equal a one-shot sequential fold expressed independently in SQL."""
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    ev = _t(spark, sf_dir, "events")
    is_u = ~F.col("event_type").isin("signup", "error")
    eid = F.col("event_id")
    changelog = ev.select(
        eid.alias("lsn"),
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.when(is_u & (eid % 3 == 0), F.lit("__unavailable__"))
        .when(eid % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("a"), eid.cast("string")))
        .alias("a"),
        F.when(is_u & (eid % 5 == 0), F.lit("__unavailable__"))
        .when(eid % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.col("event_type"), eid.cast("string")))
        .alias("b"),
    )
    payload = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ]
    )
    root = _swept_scratch_dir("partq") + "/tbl"
    pipe = MergePipeline(
        spark,
        root,
        key="doc_id",
        n_buckets=8,
        payload_schema=payload,
        placeholder_cols=["a", "b"],
    )
    lo, hi = _event_id_bounds(spark, sf_dir)
    step = max((hi - lo + 1) // 3 + 1, 1)
    for i in range(3):
        batch = changelog.filter(
            (F.col("lsn") >= lo + i * step) & (F.col("lsn") < lo + (i + 1) * step)
        )
        pipe.apply(batch, batch_id=i)
    return pipe.table.read().select(
        "doc_id", "a", "b", F.col("_lsn").alias("last_lsn")
    )


# =====================================================================
# Registry
# =====================================================================

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "lww_latest_event": (q_lww_latest_event, _LWW_ORACLE),
    "lww_window": (q_lww_window, _LWW_ORACLE),
    "lww_applyinpandas": (q_lww_applyinpandas, _LWW_ORACLE),
    "lww_salted": (q_lww_salted, _LWW_ORACLE),
    "cdc_engine_final_state": (q_cdc_engine_final_state, _CDC_FINAL_ORACLE),
    "cdc_mor_final_state": (q_cdc_mor_final_state, _CDC_FINAL_ORACLE),
    "cdc_point_lookup": (q_cdc_point_lookup, _CDC_LOOKUP_ORACLE),
    "cdc_mor_point_lookup": (q_cdc_mor_point_lookup, _CDC_LOOKUP_ORACLE),
    "cdc_dlq_rejects": (q_cdc_dlq_rejects, _DLQ_REJECTS_ORACLE),
    "cdc_dlq_final_state": (q_cdc_dlq_final_state, _DLQ_FINAL_ORACLE),
    "cdc_secondary_index": (q_cdc_secondary_index, _SECIDX_ORACLE),
    "cdc_index_lookup": (q_cdc_index_lookup, _SECIDX_LOOKUP_ORACLE),
    "cdc_zone_map_scan": (q_cdc_zone_map_scan, _ZONE_MAP_ORACLE),
    "ivm_group_totals": (q_ivm_group_totals, _IVM_ORACLE),
    "cdc_changefeed": (q_cdc_changefeed, _CHANGEFEED_ORACLE),
    "cdc_scd2_history": (q_cdc_scd2_history, _SCD2_ORACLE),
    "cdc_scd2_as_of": (q_cdc_scd2_as_of, _SCD2_ASOF_ORACLE),
    "cdc_txn_atomic": (q_cdc_txn_atomic, _TXN_ORACLE.format(loss=_LOSS_SQL)),
    "cdc_snapshot_bootstrap": (q_cdc_snapshot_bootstrap, _SNAPSHOT_BOOTSTRAP_ORACLE),
    "partial_update_resolve": (q_partial_update_resolve, _PARTIAL_ORACLE),
    "cdc_delete_where": (q_cdc_delete_where, _DELETE_WHERE_ORACLE),
    "cdc_update_where": (q_cdc_update_where, _UPDATE_WHERE_ORACLE),
    "cdc_schema_drift": (q_cdc_schema_drift, _SCHEMA_DRIFT_ORACLE),
    "cdc_multi_table": (q_cdc_multi_table, _MULTI_TABLE_ORACLE),
    "cdc_kitchen_sink": (q_cdc_kitchen_sink, _KITCHEN_SINK_ORACLE),
    "lsn_gaps": (q_lsn_gaps, _LSN_GAPS_ORACLE),
    "cdc_snapshot_diff": (q_cdc_snapshot_diff, _CDC_DIFF_ORACLE),
    "watermark_per_source": (
        q_watermark_per_source,
        "SELECT event_type, max(event_id) AS watermark_lsn, count(*) AS n_events "
        "FROM events GROUP BY event_type",
    ),
    "ordered_replay_seq": (
        q_ordered_replay_seq,
        "SELECT user_id, event_id, row_number() OVER "
        "(PARTITION BY user_id ORDER BY event_id) AS seq FROM events",
    ),
    "anti_join_unseen": (
        q_anti_join_unseen,
        "SELECT DISTINCT user_id FROM events e WHERE NOT EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)",
    ),
    "dispatch_union": (
        q_dispatch_union,
        "SELECT event_id, user_id, round(value, 4) AS value, 'purchase' AS branch "
        "FROM events WHERE event_type = 'purchase' "
        "UNION ALL "
        "SELECT event_id, user_id, NULL AS value, 'signup' AS branch "
        "FROM events WHERE event_type = 'signup'",
    ),
    "scalar_projection": (
        q_scalar_projection,
        """SELECT event_id,
                  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
                  TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k,
                  CASE WHEN ts IS NULL
                       THEN 'NotAcceptable ' || event_type || '/None'
                       ELSE event_type || '/' || strftime(ts, '%Y-%m-%dT%H:%M:%SZ')
                  END AS version_id
           FROM events""",
    ),
    "missing_ratio_diag": (
        q_missing_ratio_diag,
        "SELECT event_type, round(100.0 * avg(CASE WHEN value < 1.0 THEN 1 ELSE 0 END), 4)"
        " AS pct_low, "
        "coalesce(array_to_string((list_sort(list(event_id) FILTER (WHERE value < 1.0)))[1:3], "
        "','), '') AS examples "  # DuckDB array_to_string([]) is NULL; Spark concat_ws is ''
        "FROM events GROUP BY event_type",
    ),
    "tumbling_window_stats": (
        q_tumbling_window_stats,
        "SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')"
        " AS window_start, event_type, count(*) AS n_events,"
        " round(sum(value), 4) AS sum_value"
        " FROM events GROUP BY 1, 2",
    ),
    "sessionize": (
        q_sessionize,
        """WITH g AS (
             SELECT user_id, event_id, ts,
                    CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           ), s AS (
             SELECT user_id, event_id,
                    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
             FROM g
           )
           SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
                  min(event_id) AS first_event_id, max(event_id) AS last_event_id
           FROM s GROUP BY 1, 2""",
    ),
    "windowed_rollup_stream": (q_windowed_rollup_stream, _WINDOWED_STREAM_ORACLE),
    "session_rollup_stream": (q_session_rollup_stream, _SESSION_STREAM_ORACLE),
    "cdc_maintenance_loop": (q_cdc_maintenance_loop, _CDC_MAINT_ORACLE),
    "salted_count": (
        q_salted_count,
        "SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS sum_value "
        "FROM events GROUP BY user_id",
    ),
    "asof_join_last_order": (q_asof_join, _ASOF_ORACLE),
    "pivot_event_matrix": (q_pivot_event_matrix, _PIVOT_ORACLE),
    "rollup_revenue": (q_rollup_revenue, _ROLLUP_ORACLE),
    "value_percentiles": (q_value_percentiles, _PCT_ORACLE),
    "tpch_q1": (q_tpch_q1, _TPCH_Q1_ORACLE),
    "top_orders_by_revenue": (q_top_orders_by_revenue, _TOP_ORDERS_ORACLE),
    "broadcast_dim_join": (q_broadcast_dim_join, _REGION_ORACLE),
    "dedup_exact": (q_dedup_exact, _DEDUP_EXACT_ORACLE),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, _JACCARD_ORACLE),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, _minhash_oracle()),
    "dedup_incremental_minhash": (
        q_dedup_incremental_minhash,
        _incremental_minhash_oracle(),
    ),
    "dedup_clusters": (q_dedup_clusters, _dedup_clusters_oracle()),
    "text_quality": (q_text_quality, _TEXT_QUALITY_ORACLE),
    "repetition_quality": (q_repetition_quality, _REPETITION_ORACLE),
    "lang_id": (q_lang_id, _lang_oracle()),
    "token_count": (q_token_count, _TOKEN_COUNT_ORACLE),
    "token_vocab": (q_token_vocab, _TOKEN_VOCAB_ORACLE),
    "chunk_documents": (q_chunk_documents, _CHUNK_DOCS_ORACLE),
    "doc_fingerprint": (q_doc_fingerprint, _FINGERPRINT_ORACLE),
    "dedup_simhash": (q_dedup_simhash, _simhash_oracle()),
    "ann_brute_force": (q_ann_brute_force, _ANN_ORACLE),
    "ann_lsh": (q_ann_lsh, _ann_lsh_oracle()),
    "ann_lsh_multiprobe": (q_ann_lsh_multiprobe, _ann_lsh_oracle(multiprobe=True)),
    "ann_ivf": (q_ann_ivf, _ann_ivf_oracle()),
    "ann_ivf_sampled": (q_ann_ivf_sampled, _ann_ivf_oracle(_IVF_TRAIN_FRACTION)),
    "ann_index_state": (q_ann_index_state, _ann_index_state_oracle()),
    "corpus_curation": (q_corpus_curation, _corpus_curation_oracle()),
    "embedding_neardup": (q_embedding_neardup, _NEARDUP_COS_ORACLE),
    "multimodal_meta": (q_multimodal_meta, _MULTIMODAL_ORACLE),
    "multimodal_decode": (q_multimodal_decode, _MULTIMODAL_DECODE_ORACLE),
    "dedup_state_flags": (q_dedup_state_flags, _dedup_state_oracle()),
    "dedup_token_prefix": (q_dedup_token_prefix, _TOKEN_DEDUP_ORACLE),
    "entity_tables_typed": (q_entity_tables_typed, _ENTITY_TYPED_ORACLE),
    "sequence_pack": (q_sequence_pack, _SEQUENCE_PACK_ORACLE),
    "sequence_pack_greedy": (q_sequence_pack_greedy, _SEQUENCE_PACK_GREEDY_ORACLE),
}

# Rotation for the driver's budget-truncated record: its r4/r5 records
# each stopped at exactly 50 queries in insertion order, so whatever sits
# last never gets a driver-recorded check. Front-load (a) this round's
# NEW queries and (b) every query the r5 driver record missed; the
# builder's own closing gate (scripts/correctness_sweep.py →
# CORRECTNESS_SELF_r{N}.json) always runs the whole registry regardless.
QUERIES.update(
    {
        # registered here (not in the literal above) since the round-4
        # rotation; keep them registered
        "sequence_pack_tokens": (q_sequence_pack_tokens,
                                 _SEQUENCE_PACK_TOKENS_ORACLE),
        "pii_scrub": (q_pii_scrub, _PII_ORACLE),
        "train_val_split": (q_train_val_split, _SPLIT_ORACLE),
        "decontaminate": (q_decontaminate, _DECONTAMINATE_ORACLE),
    }
)
_DRIVER_ROTATION_FIRST = [
    # round-6 additions
    "windowed_rollup_stream",
    "session_rollup_stream",
    "cdc_maintenance_loop",
    "cdc_scd2_as_of",
    "cdc_kitchen_sink",
    "token_vocab",
    "chunk_documents",
    # missed by the 50-slot CORRECTNESS_r05.json record
    "text_quality",
    "repetition_quality",
    "lang_id",
    "token_count",
    "doc_fingerprint",
    "dedup_simhash",
    "ann_brute_force",
    "ann_lsh",
    "ann_lsh_multiprobe",
    "ann_ivf",
    "ann_ivf_sampled",
    "ann_index_state",
    "corpus_curation",
    "embedding_neardup",
    "multimodal_meta",
    "multimodal_decode",
    "dedup_state_flags",
    "dedup_token_prefix",
    "entity_tables_typed",
    "sequence_pack",
    "sequence_pack_greedy",
]
QUERIES = {
    **{name: QUERIES[name] for name in _DRIVER_ROTATION_FIRST},
    **QUERIES,
}


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
