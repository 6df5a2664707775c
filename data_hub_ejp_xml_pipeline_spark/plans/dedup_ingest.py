"""Dedup-on-ingest: persisted MinHash band state + exactly-once flags.

``operators.dedup.incremental_minhash_flags`` is function-level: it needs
the corpus's precomputed band table handed to it. This module makes that
state DURABLE and epoch-consistent, the way a 100 TB ingest loop runs it:

* the **band state** lives in a :class:`SnapshotTable` keyed (bucketed) by
  ``band_hash`` — the equi-join column of the LSH candidate probe — and is
  APPENDED per epoch with the batch's bands (exactly-once via the table's
  batch-id ledger);
* a **docs table** (doc_id, text) accumulates the corpus side needed for
  the exact-Jaccard verify (candidate-bounded: only matched docs are ever
  re-shingled). At full scale this duplicates corpus text held by the main
  ingest table — pass ``docs_provider=`` to read it from there instead and
  keep text stored once;
* each epoch's **flags** are appended to a flags table carrying the epoch
  id, so downstream consumers get exactly-once flag emission.

Replay stability (the CDC contract): flags for epoch *N* are always
computed against the state **as of before N** — when a replayed epoch finds
its batch_id in the band ledger, the corpus view is time-traveled to the
snapshot preceding that append. So crash anywhere between the three
appends converges: already-applied appends no-op on their ledgers, the
flag recompute sees the identical pre-N corpus, and the missing appends
apply. (With ``docs_provider`` the text side cannot be time-traveled here;
if the provider's text for a matched doc changed between run and replay,
recomputed ``jaccard`` values may differ — the flags LEDGER still
prevents double emission, so only the crash-window recompute sees drift.)

Reference analog: the pipeline-level "seen files" dedup
(``dags/s3_xml_import_pipeline.py`` named-literals query) persisted as
engine state rather than a warehouse query.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators import dedup
from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

BAND_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("band_no", T.IntegerType()),
        T.StructField("band_hash", T.StringType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

FLAGS_SCHEMA = T.StructType(
    [
        T.StructField("new_doc", T.StringType()),
        T.StructField("matched_doc", T.StringType()),
        T.StructField("jaccard", T.DoubleType()),
        T.StructField("matched_in", T.StringType()),
        T.StructField("epoch", T.LongType()),
    ]
)


class DedupIngestState:
    """Durable incremental near-dup detection for an ingest loop."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        threshold: float = 0.8,
        n_hashes: int = 9,
        band_size: int = 3,
        k: int = 3,
        n_buckets: int = 16,
        docs_provider: Callable[[], DataFrame] | None = None,
    ):
        self.spark = spark
        self.threshold = threshold
        self.n_hashes = n_hashes
        self.band_size = band_size
        self.k = k
        self.docs_provider = docs_provider
        self.bands = _open_table(spark, root + "/bands", BAND_SCHEMA,
                                 "band_hash", n_buckets)
        self.flags = _open_table(spark, root + "/flags", FLAGS_SCHEMA,
                                 "new_doc", n_buckets)
        self.docs = (
            None
            if docs_provider is not None
            else _open_table(spark, root + "/docs", DOCS_SCHEMA, "doc_id",
                             n_buckets)
        )

    def apply(self, batch_docs: DataFrame, batch_id: int,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
        """One epoch: flag the batch's near-dups against the persisted
        corpus state, then append the batch's bands (+docs) and the flags
        — each append exactly-once on its own ledger. Returns this epoch's
        flags (recomputed deterministically on replay)."""
        batch = batch_docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).cast("string").alias("text"),
        )

        pre_bands_v = _version_before(self.bands, batch_id)
        corpus_bands = self.bands.read(version=pre_bands_v)
        if self.docs is not None:
            pre_docs_v = _version_before(self.docs, batch_id)
            corpus_docs = self.docs.read(version=pre_docs_v)
        else:
            corpus_docs = self.docs_provider().select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.col(text_col).cast("string").alias("text"),
            )

        persisted: list = []
        flags = dedup.incremental_minhash_flags(
            batch,
            corpus_docs,
            corpus_bands.select("doc_id", "band_no", "band_hash"),
            threshold=self.threshold,
            n_hashes=self.n_hashes,
            band_size=self.band_size,
            k=self.k,
            persist_registry=persisted,
        ).withColumn("epoch", F.lit(batch_id).cast("long"))

        batch_bands = dedup.minhash_band_state(
            batch, n_hashes=self.n_hashes, band_size=self.band_size, k=self.k
        )
        self.bands.append(batch_bands, batch_id=batch_id)
        if self.docs is not None:
            self.docs.append(batch, batch_id=batch_id)
        self.flags.append(flags, batch_id=batch_id)
        # the epoch's results are durable — free this epoch's cached
        # shingles (a long-running tailer would otherwise accumulate one
        # persisted table per epoch). The returned flags recompute lazily
        # if re-collected; the pipelines consume only the durable table.
        for df_cached in persisted:
            df_cached.unpersist()
        return flags

    # -------------------------------------------------------------- reads
    def all_flags(self) -> DataFrame:
        return self.flags.read().drop("_lsn")

    def flagged_doc_ids(self) -> DataFrame:
        """Distinct new_doc ids ever flagged — the left-anti filter side
        for a keep-canonical ingest policy."""
        return self.flags.read().select(F.col("new_doc").alias("doc_id")).distinct()

    def expire(self, keep_last: int = 2) -> dict:
        """Reclaim old snapshots/orphans across the state tables (the
        per-epoch appends mint one snapshot per table per epoch; a
        long-running tailer needs this swept like any other table)."""
        out = {
            "bands": self.bands.expire_snapshots(keep_last=keep_last),
            "flags": self.flags.expire_snapshots(keep_last=keep_last),
        }
        if self.docs is not None:
            out["docs"] = self.docs.expire_snapshots(keep_last=keep_last)
        return out


TOKEN_FP_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)

TOKEN_FLAGS_SCHEMA = T.StructType(
    [
        T.StructField("new_doc", T.StringType()),
        T.StructField("matched_doc", T.StringType()),
        T.StructField("fp", T.StringType()),
        T.StructField("matched_in", T.StringType()),
        T.StructField("epoch", T.LongType()),
    ]
)


class TokenDedupState:
    """EXACT dedup-on-ingest for pre-tokenized sequence payloads — the
    token-pipeline (MergePipeline/MorPipeline) sibling of
    :class:`DedupIngestState`, which shingles TEXT.

    Fingerprint = md5 of the token array (or its first ``prefix_k``
    tokens — identical sequence STARTS are how exact dups of training
    sequences usually manifest after truncation/packing). The corpus
    state is one (fp, doc_id) table bucketed by fp, so the per-epoch
    probe is an equi-join of the (small) batch fingerprints against a
    co-located scan: O(batch + matches), never O(corpus). Same
    exactly-once + replay-time-travel contract as DedupIngestState; the
    fingerprint table stores NO token bytes, so unlike the docs table
    there is no text duplication at any scale.

    The state is APPEND-ONLY: when a doc's tokens change across epochs,
    its earlier fingerprints remain — a later match against a superseded
    version is still flagged (matching any HISTORICAL content is the
    conservative choice for training-data dedup). A maintenance pass can
    compact to latest-per-doc if current-content-only semantics are
    wanted."""

    _UNSET = object()

    def __init__(self, spark: SparkSession, root: str,
                 prefix_k=_UNSET, n_buckets: int = 16,
                 probe_broadcast: bool = True):
        self.spark = spark
        # prefix_k is part of the state's IDENTITY: fingerprints taken with
        # different K never match, so reopening with another K would
        # silently stop flagging real duplicates. The value is persisted
        # at the root on create and ADOPTED on open (like a table's key);
        # an explicitly-passed conflicting value raises.
        import json as _json
        import os as _os

        meta_path = _os.path.join(root, "dedup_meta.json")
        stored = None
        if _os.path.exists(meta_path):
            with open(meta_path) as fh:
                stored = _json.load(fh).get("prefix_k")
        if prefix_k is TokenDedupState._UNSET:
            prefix_k = stored  # adopt (None = full-array fingerprints)
        elif stored is not None or _os.path.exists(meta_path):
            if prefix_k != stored:
                raise ValueError(
                    f"state at {root} was created with prefix_k={stored}; "
                    f"reopening with prefix_k={prefix_k} would mix "
                    "incompatible fingerprints"
                )
        if prefix_k is not None and prefix_k < 1:
            raise ValueError(f"prefix_k must be >= 1, got {prefix_k}")
        self.prefix_k = prefix_k
        # broadcast the batch fingerprints into the corpus probe (default):
        # right whenever the corpus state dwarfs the epoch — the corpus
        # never shuffles. For extreme microbatches whose key set exceeds
        # the executor broadcast budget (~10^8 keys), set False: both
        # sides then shuffle on fp and AQE picks the join
        self.probe_broadcast = probe_broadcast
        if not _os.path.exists(meta_path):
            _os.makedirs(root, exist_ok=True)
            with open(meta_path, "w") as fh:
                _json.dump({"prefix_k": prefix_k}, fh)
        self.fingerprints = _open_table(spark, root + "/fingerprints",
                                        TOKEN_FP_SCHEMA, "fp", n_buckets)
        self.flags = _open_table(spark, root + "/flags", TOKEN_FLAGS_SCHEMA,
                                 "new_doc", n_buckets)

    def fingerprint(self, tokens_col: Column | str) -> Column:
        """NULL for null/EMPTY token arrays — concat_ws would otherwise
        fold them all onto md5('') and flag every empty doc as a dup of
        every other (one hot key, quadratic flags); null fps are dropped
        before the state append and never join."""
        c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
        sliced = F.slice(c, 1, self.prefix_k) if self.prefix_k is not None else c
        return F.when(
            c.isNull() | (F.size(c) == 0), F.lit(None).cast("string")
        ).otherwise(F.md5(F.concat_ws(",", sliced.cast("array<string>"))))

    def apply(self, batch: DataFrame, batch_id: int,
              id_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
        """One epoch: flag batch docs whose fingerprint matches the
        corpus (any) or an EARLIER doc of the same batch (smaller string
        id), then append the batch's fingerprints and the flags —
        exactly-once each, replay-stable via pre-epoch time travel.

        ``batch`` must be one row per key (e.g. already LWW-reduced).
        Pipelines should prefer :meth:`apply_changelog` — it fingerprints
        the RAW rows first so the reduce here shuffles ~50-byte
        (doc_id, fp) rows instead of token payloads."""
        fps = batch.select(
            self.fingerprint(tokens_col).alias("fp"),
            F.col(id_col).cast("string").alias("doc_id"),
        )
        return self._apply_fps(fps, batch_id)

    def _apply_fps(self, fps: DataFrame, batch_id: int) -> DataFrame:
        # persisted for the epoch: fps feeds the corpus probe, the
        # batch-internal self-join, the state append, and the flags append
        # — without a cache the upstream (a reduce) would re-execute for
        # each of those actions. Null fps (empty/absent token arrays)
        # carry no dedup signal — drop them here.
        fps = fps.filter(F.col("fp").isNotNull()).persist()
        pre_v = _version_before(self.fingerprints, batch_id)
        corpus = self.fingerprints.read(version=pre_v)

        # the batch fingerprint table BROADCASTS into the corpus probe —
        # one map-side scan of the (bucketed) corpus state, never a
        # corpus shuffle (same shape as the MinHash band probe)
        probe = F.broadcast(fps) if self.probe_broadcast else fps
        cand_corpus = (
            probe.alias("n")
            .join(
                corpus.alias("c"),
                (F.col("n.fp") == F.col("c.fp"))
                & (F.col("n.doc_id") != F.col("c.doc_id")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc"),
                F.col("c.doc_id").alias("matched_doc"),
                F.col("n.fp").alias("fp"),
                F.lit("corpus").alias("matched_in"),
            )
        )
        a, b = fps.alias("a"), fps.alias("b")
        cand_batch = (
            a.join(
                b,
                (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("b.doc_id").alias("new_doc"),
                F.col("a.doc_id").alias("matched_doc"),
                F.col("a.fp").alias("fp"),
                F.lit("batch").alias("matched_in"),
            )
        )
        flags = (
            cand_corpus.unionByName(cand_batch)
            .distinct()
            .withColumn("epoch", F.lit(batch_id).cast("long"))
        )
        # the epoch id rides in as the rows' _lsn so compact_latest has a
        # real "appended later" ordering (appends otherwise store _lsn=0)
        self.fingerprints.append(
            fps.withColumn("lsn", F.lit(batch_id).cast("long")),
            batch_id=batch_id,
        )
        self.flags.append(flags, batch_id=batch_id)
        fps.unpersist()  # durable now; re-collecting `flags` recomputes
        return flags

    def apply_changelog(self, changelog: DataFrame, batch_id: int,
                        id_col: str = "doc_id", tokens_col: str = "tokens",
                        lsn_col: str = "lsn", op_col: str = "op") -> DataFrame:
        """Fingerprint-then-reduce entry point for a RAW changelog batch:
        the md5 prefix fingerprint is computed per row in whole-stage
        codegen, then the per-key LWW winner is picked over
        (doc_id, lsn, fp, op) ONLY — the shuffle never carries the token
        payload and the pipeline's own reduce is not re-executed
        (measured: the naive reduced-batch path costs a second full
        payload shuffle per epoch). Deletes are dropped after the reduce
        (a key whose winner is a delete must not enter the corpus).

        Tie-break on equal (doc_id, lsn): the SAME lineage columns the
        main reduce uses (operators.lww._ORDER_COLS: offset, source_file
        — when present), so the dedup winner and the table's winner are
        the same row; an equal-lsn update/delete sibling pair cannot make
        the table keep the update while the dedup path drops the key as
        deleted. Without lineage columns, falls back to (fp, op)."""
        from data_hub_ejp_xml_pipeline_spark.operators.lww import _ORDER_COLS

        tie = [c for c in _ORDER_COLS[1:] if c in changelog.columns]
        rows = changelog.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(lsn_col).alias("_l"),
            self.fingerprint(tokens_col).alias("fp"),
            F.col(op_col).alias("_o"),
            *[F.col(c) for c in tie],
        )
        order = (
            F.struct("_l", *tie) if tie else F.struct("_l", "fp", "_o")
        )
        winner = rows.groupBy("doc_id").agg(
            F.max_by(F.struct("fp", "_o"), order).alias("w")
        )
        live = winner.filter(F.col("w._o") != "D").select(
            F.col("w.fp").alias("fp"), "doc_id"
        )
        return self._apply_fps(live, batch_id)

    def compact_latest(self, batch_id: int | None = None):
        """Maintenance: rewrite the fingerprint state to ONE row per doc
        (the last-appended fingerprint wins via the rows' commit ``_lsn``,
        tie-broken by fp for same-commit duplicates). Switches the state
        from match-any-HISTORICAL-version semantics (the append-only
        default) to match-current-content-only — run it when superseded
        versions should stop attracting flags, and to bound state growth
        under heavy re-ingestion. One shuffle on doc_id + a truncate +
        re-append; exactly-once via ``batch_id`` on the re-append."""
        latest = (
            self.fingerprints.read()
            .groupBy("doc_id")
            .agg(
                F.max_by(
                    F.struct("fp", F.col("_lsn").alias("lsn")),
                    F.struct(F.col("_lsn"), F.col("fp")),
                ).alias("w")
            )
            .select(F.col("w.fp").alias("fp"), "doc_id",
                    F.col("w.lsn").alias("lsn"))
            .persist()
        )
        latest.count()  # materialize BEFORE truncate drops the source files
        self.fingerprints.truncate()
        res = self.fingerprints.append(latest, batch_id=batch_id)
        latest.unpersist()
        return res

    def expire(self, keep_last: int = 2) -> dict:
        """Reclaim old snapshots/orphans across the state tables."""
        return {
            "fingerprints": self.fingerprints.expire_snapshots(keep_last=keep_last),
            "flags": self.flags.expire_snapshots(keep_last=keep_last),
        }

    def all_flags(self) -> DataFrame:
        return self.flags.read().drop("_lsn")


def _open_table(spark: SparkSession, root: str, schema: T.StructType,
                key: str, n_buckets: int) -> SnapshotTable:
    if SnapshotTable.exists(root):
        return SnapshotTable(spark, root)
    return SnapshotTable.create(spark, root, schema, key=key, n_buckets=n_buckets)


def _version_before(table: SnapshotTable, batch_id: int) -> int | None:
    """The table version immediately BEFORE ``batch_id`` was applied, or
    None (current) when the epoch has not been applied yet."""
    snap = table.ledger().get(str(batch_id))
    if snap is None:
        return None
    v = table.current_version()
    while v > 0:
        if table.manifest(v)["snapshot_id"] == snap:
            return v - 1
        v -= 1
    return None
