"""Snapshot-log-over-Parquet table with Iceberg MERGE semantics.

Replaces the reference's append-only BigQuery sink + downstream
latest-view (``bq_data_service.py:17-52`` WRITE_APPEND) with an explicit
keyed MERGE (SURVEY.md §2.5 J4), and its S3 watermark state file
(``etl_state.py:14-76``) with an epoch ledger committed atomically with
the data (closes the reference's crash-between-load-and-state duplicate
hole at ``etl.py:190-195``).

Design for 100 TB:

* **Bucketed copy-on-write.** Every data file belongs to a hash bucket
  ``pmod(xxhash64(key), n_buckets)``. A merge only reads and rewrites the
  buckets its update batch touches — file-level pruning identical in
  spirit to Iceberg manifest pruning. Untouched files are carried forward
  by reference in the new manifest (no data movement).
* **Atomic commits.** A commit = write immutable data files → write
  ``meta/v{N}.json`` manifest → atomically swap the ``meta/VERSION``
  pointer (``os.replace``). Readers resolve the pointer once and read an
  immutable snapshot; a crash mid-commit leaves garbage files but a
  consistent table.
* **Exactly-once.** The manifest embeds the epoch ledger
  ``{batch_id → snapshot_id}``; re-applying an already-committed batch is
  a metadata no-op, so streaming replay from any checkpoint converges to
  byte-identical state.
* **Lineage.** Each commit records per-source-file offset ranges
  (FIXTURES.md §5), generalizing the reference's per-row provenance
  struct (``ejp_zip.py:66-69``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.table.schema_evolution import (
    conform_to_schema,
    merge_schemas,
)

_NON_PAYLOAD = {"op", "lsn", "source_file", "offset", "event_ts", "_bucket", "_salt",
                "_lsn", "_deleted"}
LSN_COL = "_lsn"
DELETED_COL = "_deleted"
INTERNAL_COLS = (LSN_COL, DELETED_COL)


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the table while this commit was in flight."""


@dataclass
class CommitResult:
    snapshot_id: str
    version: int
    applied: bool  # False when the batch_id was already in the ledger
    rows_written: int = 0
    n_events: int = 0  # events observed in the batch (from the stats job)
    max_event_ts: Any = None  # max event_ts in the batch, for lag metrics


class SnapshotTable:
    """Iceberg-semantics table: create/append/merge/add_columns/time-travel."""

    # Batches at or below this many events merge via a broadcast plan (the
    # target side is scanned map-side — never shuffled, never sorted);
    # above it, the sort-merge full-outer join runs. Default 0 = always
    # sort-merge: measured in THIS sandbox (single JVM, tmpfs shuffle) SMJ
    # wins at every batch size because a local shuffle is nearly free while
    # the broadcast plan pays a second pruned target scan + a driver-side
    # broadcast build. On a real cluster — network shuffle, 100 TB target,
    # small steady-state microbatches — set this to the largest batch size
    # whose reduced form fits executor memory (e.g. 500k rows) so the
    # target side stops being shuffled+sorted every epoch.
    broadcast_merge_max_rows: int = 0

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------------------------------------------------------------- setup
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key: str = "doc_id",
        n_buckets: int = 16,
    ) -> "SnapshotTable":
        """Create an empty table. ``schema`` is the payload schema (must
        include ``key``); the engine appends ``_lsn`` internally."""
        extra = [
            T.StructField(name, dtype, True)
            for name, dtype in ((LSN_COL, T.LongType()), (DELETED_COL, T.BooleanType()))
            if _find_field(schema, name) is None
        ]
        schema = T.StructType(list(schema.fields) + extra)
        os.makedirs(os.path.join(root, "meta"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        manifest = {
            "version": 0,
            "snapshot_id": "snap-00000000-create",
            "parent": None,
            "operation": "create",
            "key": key,
            "n_buckets": n_buckets,
            "schema": json.loads(schema.json()),
            "files": [],
            "ledger": {},
            "lineage": [],
            "ts": time.time(),
        }
        table = cls(spark, root)
        table._write_manifest(manifest)
        return table

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "meta", "VERSION"))

    # ------------------------------------------------------------- metadata
    def current_version(self) -> int:
        with open(os.path.join(self.root, "meta", "VERSION")) as fh:
            return int(fh.read().strip())

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.root, "meta", f"v{v:08d}.json")) as fh:
            return json.load(fh)

    def snapshot_id(self, version: int | None = None) -> str:
        return self.manifest(version)["snapshot_id"]

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.manifest(version)["schema"])

    def ledger(self) -> dict[str, str]:
        return self.manifest()["ledger"]

    def lineage(self) -> list[dict[str, Any]]:
        return self.manifest()["lineage"]

    def snapshots(self) -> list[dict[str, Any]]:
        out = []
        for v in range(self.current_version() + 1):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue  # expired by expire_snapshots(); history starts later
            out.append({"version": v, "snapshot_id": m["snapshot_id"], "operation": m["operation"]})
        return out

    # ----------------------------------------------------------------- read
    def read(
        self,
        version: int | None = None,
        buckets: set[int] | None = None,
        include_tombstones: bool = False,
    ) -> DataFrame:
        """Read a snapshot (time travel via ``version``), optionally pruned
        to a set of buckets (file-level pruning off the manifest).

        Deletes are stored as tombstone rows (``_deleted = true``) so that
        late-arriving older updates cannot resurrect a deleted key across
        batches; the default read filters them out. Tombstone GC is a
        retention/VACUUM concern (SURVEY.md §2.8 K5 analog), not done here.
        """
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        paths = [
            os.path.join(self.root, f["path"])
            for f in m["files"]
            if buckets is None or f["bucket"] in buckets
        ]
        if not paths:
            df = self.spark.createDataFrame([], schema)
        else:
            # explicit schema: old files lacking newly added columns → nulls
            df = self.spark.read.schema(schema).parquet(*paths)
        if include_tombstones:
            return df
        return df.filter(~F.coalesce(F.col(DELETED_COL), F.lit(False))).drop(DELETED_COL)

    # ---------------------------------------------------------------- write
    def _bucket_expr(self, key: str) -> F.Column:
        n = self.manifest()["n_buckets"]
        return F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int")

    def add_columns(self, new_schema: T.StructType) -> CommitResult:
        """Add-only recursive schema evolution (metadata-only commit)."""
        m = self.manifest()
        merged = merge_schemas(T.StructType.fromJson(m["schema"]), new_schema)
        version = m["version"] + 1
        manifest = {
            **m,
            "version": version,
            "snapshot_id": f"snap-{version:08d}-addcols",
            "parent": m["snapshot_id"],
            "operation": "add_columns",
            "schema": json.loads(merged.json()),
            "ts": time.time(),
        }
        self._write_manifest(manifest, expected_parent_version=m["version"])
        return CommitResult(manifest["snapshot_id"], version, applied=True)

    def append(self, df: DataFrame, batch_id: int | None = None) -> CommitResult:
        """Blind append (no key dedup) — the reference's WRITE_APPEND analog."""
        return self._commit(df, operation="append", batch_id=batch_id, merge=False)

    def merge(
        self,
        updates: DataFrame,
        batch_id: int | None = None,
        op_col: str = "op",
        lsn_col: str = "lsn",
        validate_unique: bool = False,
        stats_df: DataFrame | None = None,
    ) -> CommitResult:
        """MERGE INTO semantics with an LSN guard:

        ``WHEN MATCHED AND s.lsn > t._lsn AND s.op = 'D' THEN DELETE``
        ``WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE SET *``
        ``WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *``

        ``updates`` must be pre-reduced to one row per key (see
        ``operators.lww.reduce_latest``) — an un-reduced batch fans out the
        outer join and duplicates keys. Pass ``validate_unique=True`` to pay
        one extra aggregation and fail fast instead. Late rows
        (lsn ≤ applied) are dropped by the guard, making application
        order-insensitive.
        """
        if validate_unique:
            key = self.manifest()["key"]
            dup = updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
            if dup:
                raise ValueError(
                    "merge() requires one row per key; got duplicates — "
                    "run operators.lww.reduce_latest first"
                )
        return self._commit(updates, operation="merge", batch_id=batch_id, merge=True,
                            op_col=op_col, lsn_col=lsn_col, stats_df=stats_df)

    # ------------------------------------------------------------ internals
    def _commit(
        self,
        updates: DataFrame,
        operation: str,
        batch_id: int | None,
        merge: bool,
        op_col: str = "op",
        lsn_col: str = "lsn",
        stats_df: DataFrame | None = None,
    ) -> CommitResult:
        m = self.manifest()
        if batch_id is not None and str(batch_id) in m["ledger"]:
            # exactly-once: epoch already applied → metadata no-op
            return CommitResult(m["ledger"][str(batch_id)], m["version"], applied=False)

        key = m["key"]
        existing_schema = T.StructType.fromJson(m["schema"])

        # ---- schema evolution: new payload columns in the batch are added
        incoming_payload = T.StructType(
            [f for f in updates.schema.fields if f.name not in _NON_PAYLOAD]
        )
        merged_schema = merge_schemas(existing_schema, incoming_payload)
        schema_evolved = len(merged_schema.fields) != len(existing_schema.fields)

        version = m["version"] + 1
        snapshot_id = f"snap-{version:08d}-b{batch_id if batch_id is not None else 'x'}"
        snap_rel = os.path.join("data", f"snap-v{version:08d}")
        snap_dir = os.path.join(self.root, snap_rel)

        bucket = self._bucket_expr(key)
        payload_schema = T.StructType(
            [f for f in merged_schema.fields if f.name not in INTERNAL_COLS]
        )
        if merge:
            # Two jobs per commit: lineage/buckets collect + the merge-write.
            # ``stats_df`` lets callers pass the RAW (un-reduced) batch for
            # the stats job — a 3-column projection with no reduce — so the
            # expensive LWW reduce executes exactly once (in the write job).
            # Recomputing beats caching: persisting array<int> payloads costs
            # more in columnar cache serialization than the re-aggregation.
            src = updates.withColumn("_bucket", bucket)
            stats_src = (
                stats_df.withColumn("_bucket", bucket) if stats_df is not None else src
            )
            lineage_rows, touched, batch_stats = self._lineage_and_buckets(stats_src)
            if batch_stats["n_events"] == 0:
                # empty batch: no data files, no new snapshot (reference F4)
                return CommitResult(
                    m["snapshot_id"], m["version"], applied=False, n_events=0
                )
            src_full = src.select(
                *[conform_col(src, f).alias(f.name) for f in payload_schema.fields],
                F.col(lsn_col).cast("long").alias(LSN_COL),
                F.col(op_col).alias("_op"),
                F.col("_bucket"),
            )
            target = self.read(buckets=set(touched), include_tombstones=True)
            target = conform_to_schema(target, merged_schema).withColumn("_bucket", bucket)

            broadcast_batch = (
                batch_stats["n_events"] <= self.broadcast_merge_max_rows
            )
            result = _merge_rows(
                target, src_full, key, payload_schema, broadcast_batch
            )
        else:
            src = updates.withColumn("_bucket", bucket)
            lineage_rows, touched, batch_stats = self._lineage_and_buckets(src)
            result = (
                conform_to_schema(src, payload_schema)
                .withColumn(
                    LSN_COL,
                    F.col(lsn_col).cast("long")
                    if lsn_col in updates.columns
                    else F.lit(0).cast("long"),
                )
                .withColumn(DELETED_COL, F.lit(False))
                .withColumn("_bucket", bucket)
            )

        (
            # range-partition on the bucket id: each output partition holds
            # exactly one bucket (hash-repartition maps 64 bucket values onto
            # shuffle partitions with collisions → imbalanced write tasks)
            result.repartitionByRange(m["n_buckets"], F.col("_bucket"))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(snap_dir)
        )

        new_files = _list_bucket_files(snap_dir, snap_rel)
        if merge:
            carried = [f for f in m["files"] if f["bucket"] not in set(touched)]
        else:
            carried = list(m["files"])
        rows_written = sum(f["rows"] for f in new_files)

        manifest = {
            "version": version,
            "snapshot_id": snapshot_id,
            "parent": m["snapshot_id"],
            "operation": operation + ("+evolve" if schema_evolved else ""),
            "key": key,
            "n_buckets": m["n_buckets"],
            "schema": json.loads(merged_schema.json()),
            "files": carried + new_files,
            "ledger": (
                {**m["ledger"], str(batch_id): snapshot_id}
                if batch_id is not None
                else m["ledger"]
            ),
            "lineage": m["lineage"]
            + [{**r, "snapshot_id": snapshot_id} for r in lineage_rows],
            "ts": time.time(),
        }
        self._write_manifest(manifest, expected_parent_version=m["version"])
        return CommitResult(
            snapshot_id,
            version,
            applied=True,
            rows_written=rows_written,
            n_events=batch_stats["n_events"],
            max_event_ts=batch_stats["max_event_ts"],
        )

    # ------------------------------------------------------------ maintenance
    def expire_snapshots(self, keep_last: int = 2) -> dict[str, int]:
        """Iceberg-style snapshot expiry: drop manifests older than the
        ``keep_last`` most recent versions and delete data files referenced
        ONLY by expired snapshots (the reference's consumed-temp-object
        cleanup, ``etl.py:202-213``/K5, done safely: current state and the
        retained time-travel window are untouched)."""
        current = self.current_version()
        cutoff = max(current - keep_last + 1, 0)
        retained_files: set[str] = set()
        for v in range(cutoff, current + 1):
            retained_files.update(f["path"] for f in self.manifest(v)["files"])
        removed_files = 0
        removed_manifests = 0
        for v in range(cutoff):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            for f in m["files"]:
                if f["path"] not in retained_files:
                    fp = os.path.join(self.root, f["path"])
                    if os.path.exists(fp):
                        os.remove(fp)
                        removed_files += 1
            os.remove(os.path.join(self.root, "meta", f"v{v:08d}.json"))
            removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests,
                "oldest_retained_version": cutoff}

    def vacuum_tombstones(self, older_than_lsn: int) -> CommitResult:
        """Drop delete tombstones whose LSN is at or below a watermark the
        stream has provably passed (no event with lsn ≤ watermark can still
        arrive). Full copy-on-write rewrite — run rarely, like Iceberg
        rewrite_data_files."""
        # coalesce _deleted exactly as read() does: a NULL _deleted row is
        # live, and a NULL predicate here would silently drop it from the
        # rewrite (vacuum deleting rows read() considers live).
        live = self.read(include_tombstones=True).filter(
            ~(F.coalesce(F.col(DELETED_COL), F.lit(False)) & (F.col(LSN_COL) <= older_than_lsn))
        )
        m = self.manifest()
        key = m["key"]
        version = m["version"] + 1
        snap_rel = os.path.join("data", f"snap-v{version:08d}")
        snap_dir = os.path.join(self.root, snap_rel)
        (
            live.withColumn("_bucket", self._bucket_expr(key))
            .repartitionByRange(m["n_buckets"], F.col("_bucket"))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(snap_dir)
        )
        new_files = _list_bucket_files(snap_dir, snap_rel)
        manifest = {
            **m,
            "version": version,
            "snapshot_id": f"snap-{version:08d}-vacuum",
            "parent": m["snapshot_id"],
            "operation": "vacuum_tombstones",
            "files": new_files,
            "ts": time.time(),
        }
        self._write_manifest(manifest, expected_parent_version=m["version"])
        return CommitResult(manifest["snapshot_id"], version, applied=True,
                            rows_written=sum(f["rows"] for f in new_files))

    def _lineage_and_buckets(
        self, src: DataFrame
    ) -> tuple[list[dict[str, Any]], list[int], dict[str, Any]]:
        """One aggregation job yields the per-source-file lineage rows, the
        set of touched buckets (for file pruning), AND batch stats (event
        count, max event time) — so streaming callers need no extra pass."""
        has_ts = "event_ts" in src.columns
        if "source_file" in src.columns and "offset" in src.columns:
            aggs = [
                F.min("offset").alias("offset_min"),
                F.max("offset").alias("offset_max"),
                F.count(F.lit(1)).alias("n_events"),
                F.collect_set("_bucket").alias("buckets"),
            ]
            if has_ts:
                aggs.append(F.max("event_ts").alias("max_ts"))
            rows = src.groupBy("source_file").agg(*aggs).collect()
            lineage = [
                {
                    "source_file": r["source_file"],
                    "offset_min": r["offset_min"],
                    "offset_max": r["offset_max"],
                    "n_events": r["n_events"],
                }
                for r in rows
            ]
            touched = sorted({b for r in rows for b in r["buckets"]})
            stats = {
                "n_events": sum(r["n_events"] for r in rows),
                "max_event_ts": max(
                    (r["max_ts"] for r in rows if r["max_ts"] is not None), default=None
                )
                if has_ts
                else None,
            }
            return lineage, touched, stats
        aggs = [F.count(F.lit(1)).alias("n")]
        if has_ts:
            aggs.append(F.max("event_ts").alias("max_ts"))
        rows = src.groupBy("_bucket").agg(*aggs).collect()
        touched = sorted(r["_bucket"] for r in rows)
        stats = {
            "n_events": sum(r["n"] for r in rows),
            "max_event_ts": max(
                (r["max_ts"] for r in rows if r["max_ts"] is not None), default=None
            )
            if has_ts
            else None,
        }
        return [], touched, stats

    def _write_manifest(
        self, manifest: dict[str, Any], expected_parent_version: int | None = None
    ) -> None:
        meta = os.path.join(self.root, "meta")
        if expected_parent_version is not None:
            # optimistic concurrency (Iceberg commit semantics): the commit
            # is based on a snapshot read at the start; if another writer
            # advanced the pointer meanwhile, fail instead of losing their
            # commit. (Streaming normally guarantees one writer via
            # checkpoint ownership — this guards misconfiguration.)
            current = self.current_version()
            if current != expected_parent_version:
                raise ConcurrentCommitError(
                    f"table advanced to v{current} while committing on top of "
                    f"v{expected_parent_version}; retry the merge"
                )
        path = os.path.join(meta, f"v{manifest['version']:08d}.json")
        if expected_parent_version is not None:
            # the manifest file itself is the CAS token: O_CREAT|O_EXCL makes
            # exactly one of two racing same-parent writers win — the
            # check-then-act pre-check above alone cannot (both can pass it,
            # then the second silently overwrites the first's v{N}.json).
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                raise ConcurrentCommitError(
                    f"manifest v{manifest['version']} already written by a "
                    "concurrent committer; retry the merge"
                ) from None
            with os.fdopen(fd, "w") as fh:
                json.dump(manifest, fh)
        else:
            with open(path, "w") as fh:
                json.dump(manifest, fh)
        tmp = os.path.join(meta, f".VERSION.tmp.{os.getpid()}")
        with open(tmp, "w") as fh:
            fh.write(str(manifest["version"]))
        os.replace(tmp, os.path.join(meta, "VERSION"))  # atomic pointer swap


def _merge_rows(
    target: DataFrame,
    src_full: DataFrame,
    key: str,
    payload_schema: T.StructType,
    broadcast_batch: bool,
) -> DataFrame:
    """Produce the post-merge rows for the touched buckets.

    Two physical strategies with identical semantics (pinned by tests):

    * **broadcast** (small batches — the streaming steady state): a
      full-outer join cannot use a broadcast hash join, so decompose into
      (a) ``target LEFT JOIN broadcast(batch)`` — the 100 TB target side
      is scanned map-side with NO shuffle and NO sort — plus (b) inserts =
      ``batch ANTI JOIN broadcast(matched keys)``. Costs one extra
      column-pruned target scan branch; saves the full shuffle+sort of the
      target, which dominates at scale.
    * **sort-merge full outer** (large batches): one pass, both sides
      shuffle on the key; AQE handles skew splits.
    """
    t = target.alias("t")
    s = (F.broadcast(src_full) if broadcast_batch else src_full).alias("s")
    how = "left_outer" if broadcast_batch else "full_outer"
    joined = t.join(s, on=F.col(f"t.{key}") == F.col(f"s.{key}"), how=how)

    s_wins = F.col(f"s.{key}").isNotNull() & (
        F.col(f"t.{key}").isNull() | (F.col(f"s.{LSN_COL}") > F.col(f"t.{LSN_COL}"))
    )
    is_delete = F.col("s._op") == F.lit("D")
    # deletes become tombstone rows: late-arriving older updates must
    # not resurrect a deleted key (order-insensitivity across batches)
    deleted = F.when(s_wins, is_delete).otherwise(
        F.coalesce(F.col(f"t.{DELETED_COL}"), F.lit(False))
    )
    pick = lambda c: F.when(s_wins, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))  # noqa: E731
    merged = joined.select(
        *[pick(f.name).alias(f.name) for f in payload_schema.fields],
        pick(LSN_COL).alias(LSN_COL),
        deleted.alias(DELETED_COL),
        F.when(s_wins, F.col("s._bucket")).otherwise(F.col("t._bucket")).alias("_bucket"),
    )
    if not broadcast_batch:
        return merged

    # inserts: batch keys that matched no target row (phantom deletes are
    # recorded as tombstones). matched-keys is bounded by the batch size →
    # broadcastable anti-join; the extra target scan branch prunes to
    # (key) columns only.
    matched_keys = (
        t.join(s, on=F.col(f"t.{key}") == F.col(f"s.{key}"), how="inner")
        .select(F.col(f"t.{key}").alias(key))
        .distinct()
    )
    inserts = src_full.join(F.broadcast(matched_keys), on=key, how="left_anti").select(
        *[F.col(f.name) for f in payload_schema.fields],
        F.col(LSN_COL),
        (F.col("_op") == F.lit("D")).alias(DELETED_COL),
        F.col("_bucket"),
    )
    return merged.unionByName(inserts)


def conform_col(df: DataFrame, field: T.StructField) -> F.Column:
    names = {f.name.lower(): f for f in df.schema.fields}
    src = names.get(field.name.lower())
    if src is None:
        return F.lit(None).cast(field.dataType)
    col = F.col(src.name)
    return col.cast(field.dataType) if src.dataType != field.dataType else col


def _find_field(schema: T.StructType, name: str) -> T.StructField | None:
    for f in schema.fields:
        if f.name == name:
            return f
    return None


def _list_bucket_files(snap_dir: str, snap_rel: str) -> list[dict[str, Any]]:
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    if not os.path.isdir(snap_dir):
        return []
    entries: list[tuple[str, int, str]] = []
    for entry in sorted(os.listdir(snap_dir)):
        if not entry.startswith("_bucket="):
            continue
        bucket = int(entry.split("=", 1)[1])
        bdir = os.path.join(snap_dir, entry)
        for fn in sorted(os.listdir(bdir)):
            if fn.endswith(".parquet"):
                entries.append((entry, bucket, fn))

    def stat(e: tuple[str, int, str]) -> dict[str, Any]:
        entry, bucket, fn = e
        fp = os.path.join(snap_dir, entry, fn)
        return {
            "path": os.path.join(snap_rel, entry, fn),
            "bucket": bucket,
            "rows": pq.ParquetFile(fp).metadata.num_rows,
        }

    # footer reads are tiny but serial-latency-bound; thread them
    with ThreadPoolExecutor(max_workers=min(16, max(len(entries), 1))) as ex:
        return list(ex.map(stat, entries))
