"""One WAL tail → many tables: route a mixed Debezium envelope stream by
``source.table`` and apply each table's changelog through its own
MergePipeline.

The reference runs this exact shape for its four entity types (one zip
stream → four BigQuery tables, ``dags/s3_xml_import_pipeline.py``;
``plans/entity_pipeline.py`` is the XML analog). The Debezium variant is
what a Postgres/MySQL connector actually emits: one topic-per-server (or
a merged firehose) carrying every table's envelopes.

Exactly-once across N tables WITHOUT a cross-table transaction: every
table commits the epoch under the SAME ``batch_id`` against its OWN
ledger. A crash mid-loop leaves a prefix of tables committed; the
replayed epoch no-ops exactly those and applies the rest — convergence
per table, monotone, no coordination. (For an atomic all-tables-or-none
boundary, stage through ``operators/txn.py``.)

Scale shape: the raw batch is persisted ONCE and each table's branch is
a column filter over it (one materialization, N cheap scans); per-table
decode/reduce/merge then follow MergePipeline's pinned plans. Undeclared
or NULL table names land in the ``_unrouted`` quarantine counter rather
than vanishing.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline
from data_hub_ejp_xml_pipeline_spark.sources import debezium as dbz


@dataclass
class MultiCommitResult:
    """Duck-typed like CommitResult for the tailer's metrics row."""

    snapshot_id: str
    applied: bool
    n_events: int
    max_event_ts: object = None
    rows_written: int = 0
    version: int = -1
    per_table: dict | None = None
    unrouted: int = 0


class MultiTablePipeline:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schemas: dict[str, T.StructType],
        keys: dict[str, str] | None = None,
        n_buckets: int = 16,
        lsn_source: str = "lsn",
        json_col: str = "value",
        profile_mode: str = "pre",
    ):
        """``schemas``: table name → payload schema (must contain that
        table's key column, default ``doc_id``, override per table via
        ``keys``). Each table lives at ``{root}/{table}``."""
        if not schemas:
            raise ValueError("schemas must declare at least one table")
        self.spark = spark
        self.schemas = dict(schemas)
        self.json_col = json_col
        self.lsn_source = lsn_source
        keys = keys or {}
        self.pipes = {
            t: MergePipeline(
                spark,
                f"{root}/{t}",
                key=keys.get(t, "doc_id"),
                n_buckets=n_buckets,
                payload_schema=sch,
                profile_mode=profile_mode,
            )
            for t, sch in self.schemas.items()
        }

    def apply(self, envelopes: DataFrame, batch_id: int | None = None) -> MultiCommitResult:
        """One epoch: route → decode → per-table reduce+merge, every
        table ledgered under the same ``batch_id``."""
        if batch_id is None:
            raise ValueError(
                "MultiTablePipeline.apply requires a batch_id — per-table "
                "exactly-once is keyed on it"
            )
        raw = envelopes.persist()
        try:
            routed = dbz.route_envelopes(raw, self.schemas, json_col=self.json_col)
            unrouted = routed["_unrouted"].count()  # also materializes raw
            per_table = {}
            for t, pipe in self.pipes.items():
                decoded = dbz.decode_envelopes(
                    routed[t],
                    self.schemas[t],
                    key=pipe.key,
                    json_col=self.json_col,
                    lsn_source=self.lsn_source,
                )
                per_table[t] = pipe.apply(dbz.changelog(decoded), batch_id=batch_id)
        finally:
            raw.unpersist()
        return MultiCommitResult(
            snapshot_id=",".join(
                f"{t}:{r.snapshot_id}" for t, r in sorted(per_table.items())
            ),
            applied=any(r.applied for r in per_table.values()),
            n_events=sum(r.n_events for r in per_table.values()),
            rows_written=sum(r.rows_written for r in per_table.values()),
            per_table=per_table,
            unrouted=unrouted,
        )

    def final_state(self, table: str) -> DataFrame:
        return self.pipes[table].final_state()
