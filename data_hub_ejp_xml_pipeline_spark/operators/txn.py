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
) -> DataFrame:
    """Admit only events whose transaction is fully present.

    ``expected_col`` — per-event expected member count (from the source's
    transaction metadata). Rows with a null transaction id are admitted
    unconditionally (non-transactional sources interleave such events).
    """
    present = F.count(F.lit(1)).over(W.partitionBy(txn_col))
    return (
        changelog.withColumn("_present", present)
        .filter(F.col(txn_col).isNull() | (F.col("_present") == F.col(expected_col)))
        .drop("_present")
    )


def incomplete_transaction_summary(
    changelog: DataFrame,
    txn_col: str = "txn_id",
    expected_col: str = "txn_n",
) -> DataFrame:
    """Diagnostic: one row per held-back transaction —
    ``(txn_id, expected, present, n_missing)`` — the ops-facing view of
    what the admission filter is waiting on. Partial aggregation
    (map-side combine) before the single exchange."""
    return (
        changelog.filter(F.col(txn_col).isNotNull())
        .groupBy(txn_col)
        .agg(
            F.max(expected_col).alias("expected"),
            F.count(F.lit(1)).alias("present"),
        )
        .filter(F.col("present") < F.col("expected"))
        .withColumn("n_missing", F.col("expected") - F.col("present"))
    )
