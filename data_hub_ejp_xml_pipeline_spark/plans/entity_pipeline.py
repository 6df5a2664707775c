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

ENTITY_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("modified_timestamp", T.StringType()),
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
    ):
        self.spark = spark
        self.config = config
        self.tables: dict[str, SnapshotTable] = {}
        for entity in ENTITY_TYPES:
            root = config.table_root(entity)
            if SnapshotTable.exists(root):
                self.tables[entity] = SnapshotTable(spark, root)
            else:
                self.tables[entity] = SnapshotTable.create(
                    spark, root, ENTITY_PAYLOAD_SCHEMA, key="doc_id",
                    n_buckets=n_buckets,
                )

    def apply(self, changelog: DataFrame, batch_id: int | None = None) -> dict[str, int]:
        """One epoch: reduce + merge each entity slice. The slice filter is
        pushed into the shared scan; entity types absent from the batch are
        empty-batch no-ops (F4)."""
        # the shared batch feeds 4 tables × 2 jobs each — without a persist
        # the upstream plan (e.g. the zip parse mapInPandas) would re-execute
        # 8 times per epoch
        changelog = changelog.persist()
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
