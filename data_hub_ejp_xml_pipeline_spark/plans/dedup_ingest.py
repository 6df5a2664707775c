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

from pyspark.sql import DataFrame, SparkSession
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
        self.bands = self._open(root + "/bands", BAND_SCHEMA, "band_hash", n_buckets)
        self.flags = self._open(root + "/flags", FLAGS_SCHEMA, "new_doc", n_buckets)
        self.docs = (
            None
            if docs_provider is not None
            else self._open(root + "/docs", DOCS_SCHEMA, "doc_id", n_buckets)
        )

    def _open(self, root: str, schema: T.StructType, key: str,
              n_buckets: int) -> SnapshotTable:
        if SnapshotTable.exists(root):
            return SnapshotTable(self.spark, root)
        return SnapshotTable.create(self.spark, root, schema, key=key,
                                    n_buckets=n_buckets)

    # ------------------------------------------------------------- epochs
    def _version_before(self, table: SnapshotTable, batch_id: int) -> int | None:
        """The table version immediately BEFORE ``batch_id`` was applied,
        or None (current) when the epoch has not been applied yet. Walks
        the manifest chain for the ledgered snapshot id — O(versions)
        tiny JSON reads, replay-only path."""
        snap = table.ledger().get(str(batch_id))
        if snap is None:
            return None
        v = table.current_version()
        while v > 0:
            if table.manifest(v)["snapshot_id"] == snap:
                return v - 1
            v -= 1
        return None

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

        pre_bands_v = self._version_before(self.bands, batch_id)
        corpus_bands = self.bands.read(version=pre_bands_v)
        if self.docs is not None:
            pre_docs_v = self._version_before(self.docs, batch_id)
            corpus_docs = self.docs.read(version=pre_docs_v)
        else:
            corpus_docs = self.docs_provider().select(
                F.col(id_col).cast("string").alias("doc_id"),
                F.col(text_col).cast("string").alias("text"),
            )

        flags = dedup.incremental_minhash_flags(
            batch,
            corpus_docs,
            corpus_bands.select("doc_id", "band_no", "band_hash"),
            threshold=self.threshold,
            n_hashes=self.n_hashes,
            band_size=self.band_size,
            k=self.k,
        ).withColumn("epoch", F.lit(batch_id).cast("long"))

        batch_bands = dedup.minhash_band_state(
            batch, n_hashes=self.n_hashes, band_size=self.band_size, k=self.k
        )
        self.bands.append(batch_bands, batch_id=batch_id)
        if self.docs is not None:
            self.docs.append(batch, batch_id=batch_id)
        self.flags.append(flags, batch_id=batch_id)
        return flags

    # -------------------------------------------------------------- reads
    def all_flags(self) -> DataFrame:
        return self.flags.read().drop("_lsn")

    def flagged_doc_ids(self) -> DataFrame:
        """Distinct new_doc ids ever flagged — the left-anti filter side
        for a keep-canonical ingest policy."""
        return self.flags.read().select(F.col("new_doc").alias("doc_id")).distinct()
