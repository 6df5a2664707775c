"""Unchanged-TOAST / partial-update resolution (operators.partial).

Ground truth throughout is a sequential per-key fold in plain Python:
apply events in LSN order — I sets the row, D removes it, U overwrites
exactly the non-placeholder columns — then compare the engine's
batch-reduced + table-filled result against it, including across epoch
splits (the fold never sees epochs, the engine does).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators.partial import (
    UNAVAILABLE,
    fill_unavailable,
    reduce_latest_partial,
)
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
    ]
)
PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
    ]
)
COLS = ["a", "b"]


def fold(events):
    """Sequential ground truth: {key: {col: value}} after all events."""
    state: dict[str, dict] = {}
    for lsn, op, k, a, b in sorted(events, key=lambda e: e[0]):
        if op == "D":
            state.pop(k, None)
        elif op == "I":
            state[k] = {"a": a, "b": b}
        else:  # U
            row = state.setdefault(k, {"a": None, "b": None})
            if a != UNAVAILABLE:
                row["a"] = a
            if b != UNAVAILABLE:
                row["b"] = b
    return state


def reduced_rows(spark, events):
    df = spark.createDataFrame(
        [tuple(e) for e in events], schema=SCHEMA
    )
    out = reduce_latest_partial(df, cols=COLS)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_in_batch_fill_and_winner(spark):
    events = [
        (1, "I", "k1", "x", "y"),
        (2, "U", "k1", UNAVAILABLE, "y2"),
        (3, "U", "k1", "x3", UNAVAILABLE),
    ]
    rows = reduced_rows(spark, events)
    assert rows["k1"]["lsn"] == 3 and rows["k1"]["op"] == "U"
    assert rows["k1"]["a"] == "x3" and rows["k1"]["b"] == "y2"


def test_delete_boundary_blocks_leak(spark):
    # U after an in-batch D must not see pre-delete values
    events = [
        (1, "I", "k1", "x", "y"),
        (2, "D", "k1", "x", "y"),
        (3, "U", "k1", UNAVAILABLE, "y3"),
    ]
    rows = reduced_rows(spark, events)
    assert rows["k1"]["a"] is None and rows["k1"]["b"] == "y3"


def test_boundary_free_batch_emits_placeholder(spark):
    events = [(5, "U", "k1", UNAVAILABLE, "b5")]
    rows = reduced_rows(spark, events)
    assert rows["k1"]["a"] == UNAVAILABLE and rows["k1"]["b"] == "b5"


def test_explicit_null_is_a_real_value(spark):
    # NULL set at lsn 2 must win over "x" at 1 and NOT fall through to
    # the unresolved/placeholder branch
    events = [
        (1, "I", "k1", "x", "y"),
        (2, "U", "k1", None, UNAVAILABLE),
    ]
    rows = reduced_rows(spark, events)
    assert rows["k1"]["a"] is None and rows["k1"]["b"] == "y"


def test_delete_payload_never_a_source(spark):
    events = [
        (1, "U", "k1", "a1", "b1"),
        (2, "D", "k1", "poison", "poison"),
        (3, "I", "k1", UNAVAILABLE, "b3"),
    ]
    rows = reduced_rows(spark, events)
    # the I at 3 is the boundary; its own placeholder cannot resolve from
    # the D payload nor from pre-boundary values
    assert rows["k1"]["a"] is None and rows["k1"]["b"] == "b3"


@pytest.fixture()
def table_root(tmp_path):
    return str(tmp_path / "tbl")


def _pipeline(spark, root, **kw):
    return MergePipeline(
        spark,
        root,
        key="doc_id",
        n_buckets=4,
        payload_schema=PAYLOAD,
        placeholder_cols=COLS,
        **kw,
    )


def _apply_epochs(spark, root, events, n_epochs):
    pipe = _pipeline(spark, root)
    lo = min(e[0] for e in events)
    hi = max(e[0] for e in events)
    step = max((hi - lo + 1) // n_epochs + 1, 1)
    for i in range(n_epochs):
        batch = [
            e for e in events if lo + i * step <= e[0] < lo + (i + 1) * step
        ]
        if not batch:
            continue
        df = spark.createDataFrame([tuple(e) for e in batch], schema=SCHEMA)
        pipe.apply(df, batch_id=i)
    return {
        r["doc_id"]: (r["a"], r["b"])
        for r in pipe.final_state().select("doc_id", "a", "b").collect()
    }


def test_fill_from_table_across_epochs(spark, table_root):
    events = [
        (1, "I", "k1", "x", "y"),
        (10, "U", "k1", UNAVAILABLE, "y10"),  # second epoch, all-U
    ]
    got = _apply_epochs(spark, table_root, events, 2)
    assert got["k1"] == ("x", "y10")


def test_no_fill_across_delete_epochs(spark, table_root):
    # D in epoch 1 tombstones; the epoch-2 U must not resurrect pre-D
    # values through the table fill (lookup skips tombstones)
    events = [
        (1, "I", "k1", "x", "y"),
        (2, "D", "k1", "x", "y"),
        (10, "U", "k1", UNAVAILABLE, "y10"),
    ]
    got = _apply_epochs(spark, table_root, events, 2)
    assert got["k1"] == (None, "y10")


def test_absent_key_fills_null(spark, table_root):
    events = [(10, "U", "k9", UNAVAILABLE, "b")]
    got = _apply_epochs(spark, table_root, events, 1)
    assert got["k9"] == (None, "b")


def test_replay_is_noop(spark, table_root):
    pipe = _pipeline(spark, table_root)
    df1 = spark.createDataFrame([(1, "I", "k1", "x", "y")], schema=SCHEMA)
    df2 = spark.createDataFrame(
        [(2, "U", "k1", UNAVAILABLE, "y2")], schema=SCHEMA
    )
    pipe.apply(df1, batch_id=0)
    pipe.apply(df2, batch_id=1)
    before = pipe.final_state().collect()
    res = pipe.apply(df2, batch_id=1)  # replay
    assert res.applied is False
    assert pipe.final_state().collect() == before


def test_join_path_matches_lookup_path(spark, tmp_path):
    events = [(1, "I", f"k{i}", f"a{i}", f"b{i}") for i in range(20)] + [
        (100 + i, "U", f"k{i}", UNAVAILABLE, f"b{i}x") for i in range(20)
    ]
    outs = []
    for cap in (0, None):  # 0 forces the read()+semi-join path
        root = str(tmp_path / f"tbl{cap}")
        pipe = _pipeline(spark, root)
        df1 = spark.createDataFrame(
            [e for e in events if e[0] < 100], schema=SCHEMA
        )
        pipe.apply(df1, batch_id=0)
        batch2 = spark.createDataFrame(
            [e for e in events if e[0] >= 100], schema=SCHEMA
        )
        pre = reduce_latest_partial(batch2, cols=COLS)
        filled = fill_unavailable(
            pre, pipe.table, COLS, lookup_max_keys=cap
        )
        pipe.table.merge(filled, batch_id=1)
        outs.append(
            sorted(
                (r["doc_id"], r["a"], r["b"])
                for r in pipe.final_state().select("doc_id", "a", "b").collect()
            )
        )
    assert outs[0] == outs[1]
    assert all(a == f"a{i}" for i, (_, a, _) in enumerate(sorted(outs[0], key=lambda t: int(t[0][1:]))))


def test_guard_rejects_side_state_composition(spark, tmp_path):
    from data_hub_ejp_xml_pipeline_spark.plans.ivm import IncrementalAggState

    ivm = IncrementalAggState(
        spark, str(tmp_path / "ivm"), group_col="a", value_col=None
    )
    with pytest.raises(ValueError, match="placeholder_cols"):
        MergePipeline(
            spark,
            str(tmp_path / "tbl"),
            payload_schema=PAYLOAD,
            placeholder_cols=COLS,
            ivm_state=ivm,
        )


def test_debezium_wire_sentinel_resolves(spark, table_root):
    """The composition a WAL tail actually runs: Debezium JSON envelopes
    whose unchanged-TOAST columns carry the wire sentinel, decoded by
    sources.debezium and resolved by MergePipeline(placeholder=
    DEBEZIUM_UNAVAILABLE) — across an epoch boundary (table fill) and
    within one epoch (window fill)."""
    import json

    from data_hub_ejp_xml_pipeline_spark.operators.partial import (
        DEBEZIUM_UNAVAILABLE,
    )
    from data_hub_ejp_xml_pipeline_spark.sources import debezium as dbz

    def env(lsn, op, k, a, b):
        row = {"doc_id": k, "a": a, "b": b}
        return json.dumps(
            {
                "before": row if op == "d" else None,
                "after": None if op == "d" else row,
                "op": op,
                "ts_ms": 1_700_000_000_000 + lsn,
                "source": {"lsn": lsn, "table": "t"},
            }
        )

    pipe = MergePipeline(
        spark,
        table_root,
        key="doc_id",
        n_buckets=4,
        payload_schema=PAYLOAD,
        placeholder_cols=COLS,
        placeholder=DEBEZIUM_UNAVAILABLE,
    )
    epochs = [
        [env(1, "c", "k1", "x", "y"), env(2, "u", "k2", "p", "q")],
        [
            # k1: all-U epoch -> table fill; k2: in-epoch window fill
            env(10, "u", "k1", DEBEZIUM_UNAVAILABLE, "y10"),
            env(11, "u", "k2", "p11", DEBEZIUM_UNAVAILABLE),
            env(12, "u", "k2", DEBEZIUM_UNAVAILABLE, "q12"),
        ],
    ]
    for i, lines in enumerate(epochs):
        raw = spark.createDataFrame([(x,) for x in lines], "value string")
        decoded = dbz.decode_envelopes(raw, PAYLOAD)
        assert dbz.quarantine(decoded).count() == 0
        pipe.apply(dbz.changelog(decoded), batch_id=i)
    got = {
        r["doc_id"]: (r["a"], r["b"])
        for r in pipe.final_state().select("doc_id", "a", "b").collect()
    }
    assert got == {"k1": ("x", "y10"), "k2": ("p11", "q12")}


@pytest.mark.parametrize("seed,n_epochs", [(17, 3), (19, 5)])
def test_mor_property_matches_sequential_fold(spark, tmp_path, seed, n_epochs):
    """Merge-on-read variant: placeholders must resolve against the MOR
    view (staged-but-uncompacted epochs included) — k_compact=2 forces a
    compaction mid-stream so both fill sources are exercised."""
    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(8)]
    events = []
    for lsn in range(1, 121):
        k = rng.choice(keys)
        op = rng.choices(["I", "U", "D"], weights=[2, 6, 1])[0]

        def val(prefix):
            r = rng.random()
            if op == "U" and r < 0.4:
                return UNAVAILABLE
            if r > 0.9:
                return None
            return f"{prefix}{lsn}"

        events.append((lsn, op, k, val("a"), val("b")))
    pipe = MorPipeline(
        spark,
        str(tmp_path / "mor"),
        key="doc_id",
        n_buckets=4,
        k_compact=2,
        payload_schema=PAYLOAD,
        placeholder_cols=COLS,
    )
    step = 120 // n_epochs + 1
    for i in range(n_epochs):
        batch = [e for e in events if 1 + i * step <= e[0] < 1 + (i + 1) * step]
        if not batch:
            continue
        df = spark.createDataFrame([tuple(e) for e in batch], schema=SCHEMA)
        pipe.apply(df, batch_id=i)
    got = {
        r["doc_id"]: (r["a"], r["b"])
        for r in pipe.final_state().select("doc_id", "a", "b").collect()
    }
    want = {k: (v["a"], v["b"]) for k, v in fold(events).items()}
    assert got == want


def test_mor_guard_rejects_dedup_composition(spark, tmp_path):
    from data_hub_ejp_xml_pipeline_spark.plans.dedup_ingest import TokenDedupState
    from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline

    s = TokenDedupState(spark, str(tmp_path / "tok"), n_buckets=2)
    with pytest.raises(ValueError, match="placeholder_cols"):
        MorPipeline(
            spark,
            str(tmp_path / "mor"),
            payload_schema=PAYLOAD,
            placeholder_cols=COLS,
            dedup_state=s,
        )


@pytest.mark.parametrize("seed,n_epochs", [(7, 1), (11, 2), (13, 4)])
def test_property_matches_sequential_fold(spark, tmp_path, seed, n_epochs):
    rng = random.Random(seed)
    keys = [f"k{i}" for i in range(8)]
    events = []
    for lsn in range(1, 121):
        k = rng.choice(keys)
        op = rng.choices(["I", "U", "D"], weights=[2, 6, 1])[0]
        def val(prefix):
            r = rng.random()
            if op == "U" and r < 0.4:
                return UNAVAILABLE
            if r > 0.9:
                return None
            return f"{prefix}{lsn}"
        events.append((lsn, op, k, val("a"), val("b")))
    got = _apply_epochs(spark, str(tmp_path / "t"), events, n_epochs)
    want = {k: (v["a"], v["b"]) for k, v in fold(events).items()}
    assert got == want
