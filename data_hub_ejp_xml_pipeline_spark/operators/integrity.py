"""Changelog integrity checks.

A CDC tail's first operational question after "is it fast" is "did we
miss anything": a gap in the LSN sequence means lost events (a WAL
segment rotated away, a replication slot dropped, a producer crashed
between send and ack). The reference answers this with per-run row-count
assertions; a changelog engine needs the positional version.

Scale note: the textbook ``lead(lsn) OVER (ORDER BY lsn)`` is an
unpartitioned window — every row through ONE reducer. ``lsn_gaps``
computes the same answer with a bucketed two-level plan: intra-bucket
gaps under a window PARTITIONED by ``lsn div bucket_size`` (parallel,
bounded partitions), plus inter-bucket gaps from a per-bucket min/max
aggregate that is ~n/bucket_size rows — tiny enough that its own
ordering window is free. Missing WHOLE buckets fall out of the same
boundary pass (the gap between one bucket's max and the next present
bucket's min covers them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def lsn_gaps(
    df: DataFrame,
    lsn_col: str = "lsn",
    bucket_size: int = 100_000,
    lo: int | None = None,
    hi: int | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Missing LSN ranges as (gap_start, gap_end, n_missing), inclusive.

    ``partition_col`` switches to per-partition sequence domains — the
    Kafka/topic-partition shape, where each partition's offsets are an
    independent monotone sequence; every window/envelope below then
    additionally partitions on it and the output carries the column.

    ``lo``/``hi`` optionally pin the expected domain endpoints (per
    partition when partitioned): a gap BEFORE the first observed lsn
    (lo..min-1) or AFTER the last one (max+1..hi) is only detectable with
    an external expectation, so both default to "trust the observed
    ends". With BOTH endpoints pinned an EMPTY unpartitioned input
    reports the single total-loss gap (lo..hi) — the worst loss shape
    must not read as "no gaps". (Partitioned total loss is undetectable
    from the data alone: an empty input names no partitions; keep the
    expected partition list outside and anti-join.) Duplicate LSNs
    (replays) are harmless — distinct-ified before the scan."""
    reserved = {"b", "lsn", "bmin", "bmax", "next_lsn", "next_min",
                "gmin", "gmax", "gap_start", "gap_end", "n_missing"}
    if partition_col and partition_col.lower() in reserved:
        # "b" would be silently OVERWRITTEN by the bucket id (gaps would
        # merge across partitions with no error); the rest collide with
        # internal columns downstream — refuse instead of corrupting
        raise ValueError(
            f"partition_col {partition_col!r} collides with an internal "
            f"column of lsn_gaps ({sorted(reserved)}) — alias it first"
        )
    parts = [partition_col] if partition_col else []
    lsn = F.col(lsn_col).cast("long")
    d = df.select(*parts, lsn.alias("lsn")).distinct()
    b = d.withColumn("b", (F.col("lsn") / F.lit(bucket_size)).cast("long"))

    intra_w = W.partitionBy(*parts, "b").orderBy("lsn")
    intra = (
        b.withColumn("next_lsn", F.lead("lsn").over(intra_w))
        .filter(F.col("next_lsn") > F.col("lsn") + 1)
        .select(
            *parts,
            (F.col("lsn") + 1).alias("gap_start"),
            (F.col("next_lsn") - 1).alias("gap_end"),
        )
    )

    # per-bucket envelope: ~n/bucket_size rows — the (per-partition)
    # ordering window below runs over THIS tiny aggregate, not the data
    env = b.groupBy(*parts, "b").agg(
        F.min("lsn").alias("bmin"), F.max("lsn").alias("bmax")
    )
    env_w = W.partitionBy(*parts).orderBy("b") if parts else W.orderBy("b")
    inter = (
        env.withColumn("next_min", F.lead("bmin").over(env_w))
        .filter(F.col("next_min") > F.col("bmax") + 1)
        .select(
            *parts,
            (F.col("bmax") + 1).alias("gap_start"),
            (F.col("next_min") - 1).alias("gap_end"),
        )
    )

    gaps = intra.unionByName(inter)
    bounds = env.groupBy(*parts).agg(
        F.min("bmin").alias("gmin"), F.max("bmax").alias("gmax")
    )
    if lo is not None and hi is not None and not parts:
        # empty input + fully pinned domain = total loss, one gap row.
        # An unpartitioned global agg over empty input still yields ONE
        # row (all-NULL bounds) — which would otherwise fail the > / <
        # filters below and 100% loss would read as "no gaps".
        total_loss = bounds.filter(F.col("gmin").isNull()).select(
            F.lit(lo).cast("long").alias("gap_start"),
            F.lit(hi).cast("long").alias("gap_end"),
        )
        gaps = gaps.unionByName(total_loss)
    if lo is not None:
        head = bounds.filter(F.col("gmin") > lo).select(
            *parts,
            F.lit(lo).cast("long").alias("gap_start"),
            (F.col("gmin") - 1).alias("gap_end"),
        )
        gaps = gaps.unionByName(head)
    if hi is not None:
        tail = bounds.filter(F.col("gmax") < hi).select(
            *parts,
            (F.col("gmax") + 1).alias("gap_start"),
            F.lit(hi).cast("long").alias("gap_end"),
        )
        gaps = gaps.unionByName(tail)
    return gaps.select(
        *parts,
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("n_missing"),
    )
