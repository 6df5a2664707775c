"""Transaction-boundary grouping for changelog ingestion.

CDC sources emit events inside source-database transactions (Debezium's
transaction metadata: each event carries a transaction id and the END
marker carries the member count). Applying a PARTIAL transaction leaks
an inconsistent intermediate state into the lake — the classic bug this
operator kills. The admission rule: a transaction applies only when
every member has arrived; incomplete transactions are held back intact
(to be retried when the missing members show up, or surfaced by the
diagnostic).

Spark shape: ONE hash shuffle on the transaction id — a whole-partition
window count compared to the expected-count column each event carries.
No join, no driver-side state; at 10^10 events the transaction count is
data-sized, so a broadcast of "complete ids" is structurally wrong and
deliberately absent.

The reference pipeline has no transaction grouping (its XML containers
are single-file atomic); this is engine surface for the CDC tier,
SURVEY.md §2.9 family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def complete_transactions(
    changelog: DataFrame,
    txn_col: str = "txn_id",
    expected_col: str = "txn_n",
    seq_col: str | None = None,
) -> DataFrame:
    """Admit only events whose transaction is fully present.

    ``expected_col`` — expected member count from the source's
    transaction metadata. Debezium-faithful: only the END marker need
    carry it — the count is taken as ``max(expected_col)`` over the
    transaction's window, so events with a NULL count ride their
    marker's value. A transaction whose END marker has NOT arrived has a
    NULL expected count everywhere and is held back (its completeness is
    unknowable — exactly the partial-apply hazard this operator exists
    to stop). Rows with a null transaction id are admitted
    unconditionally (non-transactional sources interleave such events).

    ``seq_col`` — optional per-event identity (Debezium's
    ``transaction.data_collection_order`` / the event LSN). When given,
    presence counts DISTINCT identities, so at-least-once replay
    duplicates neither inflate the count past ``expected`` nor block
    admission; without it the raw window count is used and admission is
    ``>=`` so duplicates still cannot wedge a complete transaction.
    """
    w = W.partitionBy(txn_col)
    present = (
        F.size(F.collect_set(F.col(seq_col)).over(w))
        if seq_col is not None
        else F.count(F.lit(1)).over(w)
    )
    expected = F.max(expected_col).over(w)
    return (
        changelog.withColumn("_present", present)
        .withColumn("_expected", expected)
        .filter(
            F.col(txn_col).isNull()
            | (F.col("_present") >= F.col("_expected"))
        )
        .drop("_present", "_expected")
    )


def incomplete_transaction_summary(
    changelog: DataFrame,
    txn_col: str = "txn_id",
    expected_col: str = "txn_n",
    seq_col: str | None = None,
) -> DataFrame:
    """Diagnostic: one row per held-back transaction —
    ``(txn_id, expected, present, n_missing)`` — the ops-facing view of
    what the admission filter is waiting on (mirrors
    :func:`complete_transactions`' rule, including the
    no-END-marker-yet case: ``expected`` NULL, ``n_missing`` NULL).
    Partial aggregation (map-side combine) before the single exchange."""
    present = (
        F.countDistinct(F.col(seq_col))
        if seq_col is not None
        else F.count(F.lit(1))
    )
    return (
        changelog.filter(F.col(txn_col).isNotNull())
        .groupBy(txn_col)
        .agg(
            F.max(expected_col).alias("expected"),
            present.alias("present"),
        )
        .filter(
            F.col("expected").isNull()
            | (F.col("present") < F.col("expected"))
        )
        .withColumn("n_missing", F.col("expected") - F.col("present"))
    )
