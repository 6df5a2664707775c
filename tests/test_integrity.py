"""lsn_gaps: bucketed gap detection must equal the single-window oracle
on every loss shape — singletons, blocks spanning buckets, whole missing
buckets, duplicated (replayed) lsns, and pinned domain endpoints."""

from __future__ import annotations

import pytest

from data_hub_ejp_xml_pipeline_spark.operators.integrity import lsn_gaps


def _gaps(spark, lsns, **kw):
    df = spark.createDataFrame([(int(x),) for x in lsns], ["lsn"])
    rows = lsn_gaps(df, **kw).collect()
    return sorted((r.gap_start, r.gap_end, r.n_missing) for r in rows)


def _oracle(lsns, lo=None, hi=None):
    s = sorted(set(lsns))
    out = []
    if lo is not None and s and s[0] > lo:
        out.append((lo, s[0] - 1, s[0] - lo))
    for a, b in zip(s, s[1:]):
        if b > a + 1:
            out.append((a + 1, b - 1, b - a - 1))
    if hi is not None and s and s[-1] < hi:
        out.append((s[-1] + 1, hi, hi - s[-1]))
    return sorted(out)


@pytest.mark.parametrize("bucket_size", [3, 10, 1000])
def test_gap_shapes_match_oracle(spark, bucket_size):
    # singleton gap, block gap spanning buckets, whole-bucket gap, replays
    lsns = (
        list(range(1, 8)) + [9] + list(range(40, 45)) + list(range(100, 103))
        + [100, 41]  # replays
    )
    assert _gaps(spark, lsns, bucket_size=bucket_size) == _oracle(lsns)


def test_no_gaps(spark):
    assert _gaps(spark, range(5, 50), bucket_size=7) == []


def test_pinned_endpoints(spark):
    lsns = [10, 11, 12, 20]
    got = _gaps(spark, lsns, bucket_size=4, lo=1, hi=25)
    assert got == _oracle(lsns, lo=1, hi=25)
    # endpoints inside the observed range add nothing
    assert _gaps(spark, lsns, bucket_size=4, lo=10, hi=20) == _oracle(lsns)


def test_empty_input_with_pinned_domain_reports_total_loss(spark):
    empty = spark.createDataFrame([], "lsn long")
    got = lsn_gaps(empty, lo=1, hi=1000).collect()
    assert [(r.gap_start, r.gap_end, r.n_missing) for r in got] == [(1, 1000, 1000)]
    # at most one endpoint pinned: no second endpoint → empty by design
    assert lsn_gaps(empty, lo=1).collect() == []
    assert lsn_gaps(empty).collect() == []


def test_partitioned_gaps_kafka_shape(spark):
    """Per-partition sequence domains: each partition's gaps detected
    independently; pinned endpoints apply per partition."""
    rows = (
        [("p0", x) for x in [1, 2, 3, 7, 8]]        # gap 4-6
        + [("p1", x) for x in [1, 2, 3, 4, 5]]      # clean
        + [("p2", x) for x in [5, 6, 40]]           # gap 7-39; head 1-4 w/ lo
    )
    df = spark.createDataFrame(rows, ["part", "lsn"])
    got = sorted(
        (r.part, r.gap_start, r.gap_end, r.n_missing)
        for r in lsn_gaps(df, bucket_size=10, partition_col="part").collect()
    )
    assert got == [("p0", 4, 6, 3), ("p2", 7, 39, 33)]

    pinned = sorted(
        (r.part, r.gap_start, r.gap_end)
        for r in lsn_gaps(
            df, bucket_size=10, partition_col="part", lo=1, hi=41
        ).collect()
    )
    assert pinned == [
        ("p0", 4, 6), ("p0", 9, 41),
        ("p1", 6, 41),
        ("p2", 1, 4), ("p2", 7, 39), ("p2", 41, 41),
    ]


def test_partition_col_name_collision_rejected(spark):
    df = spark.createDataFrame([(1, 2)], ["b", "lsn"])
    with pytest.raises(ValueError, match="collides"):
        lsn_gaps(df, partition_col="b")
