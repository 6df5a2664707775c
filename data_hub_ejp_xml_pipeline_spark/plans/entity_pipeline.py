"""Per-entity fan-out pipeline: one changelog stream → four entity tables.

The reference loads each entity type into its own BigQuery table
(``dag_pipeline_config/xml_config.py:96-118`` maps Person/PersonV2/
Manuscript/ManuscriptVersion → tables; ``etl.py`` writes one JSONL per
type). The engine equivalent: ONE parsed changelog stream fanned into one
``SnapshotTable`` per entity type inside the same ``foreachBatch`` epoch.

Exactly-once across tables: every table keeps its own epoch ledger keyed
by the same ``batch_id``. A crash between table commits leaves a partial
epoch; on replay the already-committed tables no-op on their ledger and
only the missing ones apply — the epoch converges without coordination
(each merge is idempotent, so no cross-table transaction is needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.config import ENTITY_TYPES, PipelineConfig
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable
from data_hub_ejp_xml_pipeline_spark.table.schema_evolution import merge_schemas

ENTITY_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("modified_timestamp", T.StringType()),
    ]
)

# typed mode starts from the key + timestamp only; every payload field —
# including nested array<struct> — arrives via per-batch inference +
# add-only evolution, the reference's create_or_extend_table_schema
# behavior (bq_data_service.py:142-231) end-to-end
TYPED_BASE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("modified_timestamp", T.StringType()),
    ]
)

# never promoted from a payload JSON into a table column: engine-internal
# names and the changelog envelope
_RESERVED = {
    "doc_id", "modified_timestamp", "payload", "lsn", "op",
    "source", "source_file", "offset", "_lsn", "_deleted", "_bucket",
}


def infer_payload_schema(df: DataFrame, payload_col: str = "payload") -> T.StructType:
    """Distributed JSON schema inference over a batch's payload strings —
    the engine analog of the reference's per-batch ``generate_schema``
    (``bq_data_service.py:191-201``, which feeds BigQuery autodetect-style
    load schemas). One extra scan of the (persisted) batch; Spark's JSON
    reader unions field sets and types across all rows, so a field present
    in ANY row of the batch lands in the schema."""
    strings = df.select(payload_col).where(F.col(payload_col).isNotNull())
    inferred = strings.sparkSession.read.json(strings.rdd.map(lambda r: r[0]))
    return T.StructType(
        [
            f
            for f in inferred.schema.fields
            if not f.name.startswith("_corrupt") and f.name.lower() not in _RESERVED
        ]
    )


class EntityPipeline:
    """Fan a parsed entity changelog (``sources.xml_zip.entities_to_changelog``
    shape: ``source`` column = entity type) into one table per entity."""

    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        n_buckets: int = 16,
        payload_mode: str = "json",
        dedup_state=None,
    ):
        """``payload_mode``:

        * ``'json'``  — each entity table stores the parsed dict as one
          opaque JSON string column (compact, schema-stable).
        * ``'typed'`` — each batch's payload JSON is schema-inferred,
          parsed with ``from_json`` and stored as TYPED top-level columns
          (nested structs/arrays included); new fields in later batches
          evolve every table additively, so a user queries
          ``stages[0].stage_name`` as a real column, exactly like the
          reference's auto-extended BigQuery tables.

        A table keeps the mode it was created with — don't reopen a json
        table as typed (the payload column would be re-inferred as a
        string field).

        ``dedup_state``: an optional :class:`plans.dedup_ingest.
        DedupIngestState` — each epoch's LWW-reduced live payloads are
        flagged against the persisted corpus band state and appended to
        it (dedup-on-ingest). Requires a ``batch_id`` on every ``apply``
        (the state tables' exactly-once rides the epoch ledger).
        """
        if payload_mode not in ("json", "typed"):
            raise ValueError(f"payload_mode must be json|typed, got {payload_mode!r}")
        self.spark = spark
        self.config = config
        self.payload_mode = payload_mode
        self.dedup_state = dedup_state
        create_schema = (
            TYPED_BASE_SCHEMA if payload_mode == "typed" else ENTITY_PAYLOAD_SCHEMA
        )
        self.tables: dict[str, SnapshotTable] = {}
        for entity in ENTITY_TYPES:
            root = config.table_root(entity)
            if SnapshotTable.exists(root):
                self.tables[entity] = SnapshotTable(spark, root)
            else:
                self.tables[entity] = SnapshotTable.create(
                    spark, root, create_schema, key="doc_id",
                    n_buckets=n_buckets,
                )

    def _typed_batch(self, table: SnapshotTable, slice_df: DataFrame,
                     reduced: DataFrame) -> DataFrame:
        """JSON payload strings → typed top-level columns for ONE batch.

        Schema = existing table payload fields (existing-wins) ∪ fields
        inferred from THIS batch's JSON — so ``from_json`` keeps every
        previously-known column AND surfaces new ones; the merge commit
        then evolves the table schema additively (K3)."""
        existing = T.StructType(
            [
                f
                for f in table.schema().fields
                if f.name.lower() not in ("doc_id", "modified_timestamp",
                                          "_lsn", "_deleted")
            ]
        )
        # infer from the UNREDUCED slice (already persisted upstream):
        # re-running the LWW reduce just to infer would double the epoch's
        # reduce cost, and a field seen only in LWW-losing rows still
        # evolves the schema — same as the reference, which infers from
        # the whole JSONL batch file
        inferred = infer_payload_schema(slice_df)
        merged = merge_schemas(existing, inferred)
        if not merged.fields:
            return reduced.select("lsn", "op", "doc_id", "modified_timestamp")
        parsed = reduced.withColumn("_p", F.from_json("payload", merged))
        return parsed.select(
            "lsn",
            "op",
            "doc_id",
            "modified_timestamp",
            *[F.col("_p").getField(f.name).alias(f.name) for f in merged.fields],
        )

    def apply(self, changelog: DataFrame, batch_id: int | None = None) -> dict[str, int]:
        """One epoch: reduce + merge each entity slice. The slice filter is
        pushed into the shared scan; entity types absent from the batch are
        empty-batch no-ops (F4)."""
        # the shared batch feeds 4 tables × 2 jobs each — without a persist
        # the upstream plan (e.g. the zip parse mapInPandas) would re-execute
        # 8 times per epoch
        changelog = changelog.persist()
        if self.dedup_state is not None:
            if batch_id is None:
                raise ValueError(
                    "dedup-on-ingest requires a monotone batch_id — the "
                    "band/flags state tables commit exactly-once per epoch"
                )
            # near-dup flags over the epoch's LWW winners (live rows only:
            # a deleted doc's payload should not enter the corpus state).
            # The lineage cols ride along as the deterministic tie-break
            # for equal (doc_id, lsn) rows — without them the persisted
            # corpus/flags could differ between a run and its crash replay
            live = reduce_latest(
                changelog.select("lsn", "op", "doc_id", "payload",
                                 "source_file", "offset")
            ).filter(F.col("op") != "D")
            self.dedup_state.apply(live, batch_id=batch_id, text_col="payload")
        applied = {}
        for entity, table in self.tables.items():
            slice_df = changelog.filter(F.col("source") == entity).select(
                "lsn", "op", "doc_id", "payload", "modified_timestamp",
                "source_file", "offset",
            )
            # reduce WITH the lineage cols (they are the deterministic
            # tie-break), then drop them from the written payload — they
            # feed the lineage/stats pre-pass via stats_df only, so the
            # table keeps exactly ENTITY_PAYLOAD_SCHEMA (no surprise
            # schema-evolution commit, smaller files)
            reduced = reduce_latest(slice_df).drop("source_file", "offset")
            if self.payload_mode == "typed":
                reduced = self._typed_batch(table, slice_df, reduced)
            res = table.merge(reduced, batch_id=batch_id, stats_df=slice_df)
            applied[entity] = res.n_events
        changelog.unpersist()
        return applied

    def attach(self, changelog_stream: DataFrame, checkpoint: str,
               available_now: bool = False):
        """Streaming: one foreachBatch epoch applies all entity tables."""
        writer = changelog_stream.writeStream.foreachBatch(
            lambda df, bid: self.apply(df, batch_id=bid)
        ).option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def read(self, entity: str) -> DataFrame:
        return self.tables[entity].read()
