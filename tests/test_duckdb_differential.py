"""Differential execution of the compiled table contract on DuckDB.

``table/iceberg_adapter.py``'s statements are pinned by goldens and a
parser round-trip; this suite closes the semantic gap: the SAME contract
(create / LSN-guarded tombstone merge / add+widen evolution / soft+hard
row DML / vacuum, incl. the inclusive replication guard) is compiled to
DuckDB's dialect (``table/duckdb_adapter.py``) and EXECUTED by DuckDB,
against the same changelog the local ``SnapshotTable`` applies — a
second engine actually running the compiled plan. State must be equal
after EVERY statement family, not just at the end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.generator import (
    generate_changelog_pandas,
    spark_changelog_from_pandas,
)
from data_hub_ejp_xml_pipeline_spark.operators.lww import reduce_latest
from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable
from data_hub_ejp_xml_pipeline_spark.table.duckdb_adapter import DuckDBSnapshotTable

duckdb = pytest.importorskip("duckdb")

PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)


def _duck_feed(pdf: pd.DataFrame) -> pd.DataFrame:
    """Payload projection with DuckDB-friendly nullable dtypes (the raw
    generator frame carries float64 n_tok with NaN for deletes)."""
    out = pdf[["lsn", "op", "doc_id", "tokens", "n_tok", "source"]].copy()
    out["n_tok"] = out["n_tok"].astype("Int32")
    out["tokens"] = out["tokens"].map(
        lambda v: None if v is None or (isinstance(v, float) and np.isnan(v))
        else [int(x) for x in v]
    )
    return out


def _duck_reduce(con, pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent LWW reduce (one row per key) in DuckDB itself."""
    con.register("_raw", _duck_feed(pdf))
    try:
        return con.execute(
            "SELECT lsn, op, doc_id, tokens, n_tok, source FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM _raw"
            ") WHERE rn = 1"
        ).df()
    finally:
        con.unregister("_raw")


def _state(obj, extra_cols=()) -> pd.DataFrame:
    """Normalized full state (tombstones included) for comparison."""
    if isinstance(obj, SnapshotTable):
        pdf = obj.read(include_tombstones=True).toPandas()
    else:
        pdf = obj.read_pandas(include_tombstones=True)
    cols = ["doc_id", "tokens", "n_tok", "source", "_lsn", "_deleted", *extra_cols]
    pdf = pdf[cols].sort_values("doc_id").reset_index(drop=True)
    pdf["_deleted"] = pdf["_deleted"].astype("boolean").fillna(False).astype(bool)
    pdf["n_tok"] = pdf["n_tok"].astype("Float64")
    pdf["tokens"] = pdf["tokens"].map(
        lambda v: None if v is None or (isinstance(v, float) and np.isnan(v))
        else tuple(int(x) for x in v)
    )
    return pdf


def _na(x) -> bool:
    return not isinstance(x, (tuple, list)) and pd.isna(x)


def _eq(x, y) -> bool:
    if _na(x) or _na(y):
        return _na(x) and _na(y)
    return bool(x == y)


def _assert_equal(local: SnapshotTable, duck: DuckDBSnapshotTable,
                  stage: str, extra_cols=()) -> None:
    a, b = _state(local, extra_cols), _state(duck, extra_cols)
    assert len(a) == len(b), f"{stage}: row counts {len(a)} != {len(b)}"
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        mismatch = [
            (a["doc_id"][i], av[i], bv[i])
            for i in range(len(av))
            if not _eq(av[i], bv[i])
        ]
        assert not mismatch, f"{stage}: column {col} diverges: {mismatch[:5]}"


def test_contract_differential_execution(spark, tmp_path):
    """Every statement family, state-equal after each one."""
    pdf = generate_changelog_pandas(n_events=6_000, seed=19, replay_fraction=0.0)
    con = duckdb.connect()
    local = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), PAYLOAD, key="doc_id", n_buckets=4
    )
    duck = DuckDBSnapshotTable.create(con, "t", PAYLOAD, key="doc_id")

    n = len(pdf)
    step = n // 3 + 1
    epochs = [pdf.iloc[i * step : (i + 1) * step] for i in range(3)]

    # -- family: MERGE (epoch 0)
    local.merge(
        reduce_latest(spark_changelog_from_pandas(spark, epochs[0])), batch_id=0
    )
    duck.merge(_duck_reduce(con, epochs[0]))
    _assert_equal(local, duck, "merge epoch 0")

    # -- family: soft DELETE WHERE (tombstone at unchanged _lsn)
    local.delete_where("n_tok < 8")
    duck.delete_where("n_tok < 8")
    _assert_equal(local, duck, "soft delete")

    # -- family: UPDATE WHERE (pre-update row semantics)
    local.update_where("source = 'src2'", {"n_tok": F.expr("n_tok + 1000")})
    duck.update_where("source = 'src2'", {"n_tok": "n_tok + 1000"})
    _assert_equal(local, duck, "update where")

    # -- family: MERGE over DML'd rows (guard vs unmoved _lsn)
    local.merge(
        reduce_latest(spark_changelog_from_pandas(spark, epochs[1])), batch_id=1
    )
    duck.merge(_duck_reduce(con, epochs[1]))
    _assert_equal(local, duck, "merge epoch 1")

    # -- family: EVOLUTION (add a column) + merge the drifted batch
    drifted = epochs[2].copy()
    drifted["lang"] = drifted["source"].map(
        lambda s: None if s is None or (isinstance(s, float) and pd.isna(s))
        else s[-1]
    )
    sdf = spark_changelog_from_pandas(spark, drifted.drop(columns=["lang"]))
    sdf = sdf.withColumn("lang", F.substring("source", -1, 1))
    local.merge(reduce_latest(sdf), batch_id=2)

    incoming = T.StructType(
        list(PAYLOAD.fields) + [T.StructField("lang", T.StringType(), True)]
    )
    stmts = duck.evolve(PAYLOAD, incoming)
    assert stmts == ["ALTER TABLE t ADD COLUMN lang VARCHAR"]
    red = _duck_reduce(con, drifted[["lsn", "op", "doc_id", "tokens",
                                     "n_tok", "source"]])
    lang = drifted.sort_values("lsn").groupby("doc_id")["lang"].last()
    red["lang"] = red["doc_id"].map(lang)
    duck.merge(red)
    _assert_equal(local, duck, "evolution + drifted merge", extra_cols=("lang",))

    # -- family: hard DELETE WHERE
    local.delete_where("n_tok > 1050", hard=True)
    duck.delete_where("n_tok > 1050", hard=True)
    _assert_equal(local, duck, "hard delete", extra_cols=("lang",))

    # -- family: VACUUM at a passed watermark
    hi = int(pdf["lsn"].max())
    local.vacuum_tombstones(older_than_lsn=hi)
    duck.vacuum(hi)
    _assert_equal(local, duck, "vacuum", extra_cols=("lang",))
    dead = duck.con.execute(
        "SELECT count(*) FROM t WHERE coalesce(_deleted, false)"
    ).fetchone()[0]
    assert dead == 0


def test_inclusive_guard_differential(spark, tmp_path):
    """Replication form: equal-LSN content changes apply under >= on
    BOTH engines (and are skipped by both under the strict guard)."""
    rows = [(1, "U", "a", [1], 1, "s0"), (2, "U", "b", [2], 2, "s0"),
            (3, "D", "c", None, None, None)]
    cols = ["lsn", "op", "doc_id", "tokens", "n_tok", "source"]
    pdf = pd.DataFrame(rows, columns=cols)
    moved = pdf.copy()
    moved["source"] = ["s1", "s1", None]

    con = duckdb.connect()
    local = SnapshotTable.create(
        spark, str(tmp_path / "tbl"), PAYLOAD, key="doc_id", n_buckets=2
    )
    duck = DuckDBSnapshotTable.create(con, "t", PAYLOAD, key="doc_id")
    sdf = spark.createDataFrame(pdf, schema="lsn long, op string, doc_id string,"
                                " tokens array<int>, n_tok int, source string")
    mdf = spark.createDataFrame(moved, schema="lsn long, op string, doc_id string,"
                                " tokens array<int>, n_tok int, source string")

    local.merge(reduce_latest(sdf), batch_id=0)
    duck.merge(_duck_feed(pdf))
    # strict replay of changed content at unmoved LSNs: no-op on both
    local.merge(reduce_latest(mdf), batch_id=1)
    duck.merge(_duck_feed(moved))
    _assert_equal(local, duck, "strict equal-LSN skip")
    assert set(_state(local)["source"].dropna()) == {"s0"}
    # inclusive: applies on both
    local.merge(reduce_latest(mdf), batch_id=2, inclusive_guard=True)
    duck.merge(_duck_feed(moved), inclusive_guard=True)
    _assert_equal(local, duck, "inclusive equal-LSN apply")
    assert set(_state(local)["source"].dropna()) == {"s1"}


# ---------------------------------------------------------------------
# property form: random changelogs × random DML scripts, both engines
# state-equal after EVERY step
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

SMALL_PAYLOAD = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

_events = st.lists(
    st.tuples(
        st.integers(1, 40),      # lsn
        st.sampled_from("IUD"),  # op
        st.integers(0, 5),       # key index
        st.integers(0, 9),       # n_tok
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=2,
    max_size=30,
    unique_by=lambda e: e[0],   # unique LSNs: tie-break-free ground truth
)

_COND = st.sampled_from(["n_tok < 3", "source = 's1'", "n_tok >= 4"])
_action = st.one_of(
    st.none(),
    st.tuples(st.just("soft"), _COND),
    st.tuples(st.just("hard"), _COND),
    st.tuples(st.just("update"), _COND,
              st.sampled_from([("n_tok", "n_tok + 10"), ("source", "'zz'")])),
    st.tuples(st.just("vacuum"), st.sampled_from([10, 40])),
)


def _small_state(obj) -> list:
    if isinstance(obj, SnapshotTable):
        pdf = obj.read(include_tombstones=True).toPandas()
    else:
        pdf = obj.read_pandas(include_tombstones=True)
    pdf = pdf[["doc_id", "n_tok", "source", "_lsn", "_deleted"]]
    pdf["_deleted"] = pdf["_deleted"].astype("boolean").fillna(False).astype(bool)
    rows = []
    for r in pdf.itertuples(index=False):
        rows.append(tuple(None if pd.isna(v) else v for v in r))
    return sorted(rows, key=lambda t: t[0])


def _run_action(local, duck, act, spark):
    if act is None:
        return
    if act[0] == "soft":
        local.delete_where(act[1])
        duck.delete_where(act[1])
    elif act[0] == "hard":
        local.delete_where(act[1], hard=True)
        duck.delete_where(act[1], hard=True)
    elif act[0] == "update":
        col, expr = act[2]
        local.update_where(act[1], {col: F.expr(expr)})
        duck.update_where(act[1], {col: expr})
    elif act[0] == "vacuum":
        local.vacuum_tombstones(older_than_lsn=act[1])
        duck.vacuum(act[1])


@given(events=_events, a1=_action, a2=_action)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
def test_differential_random_scripts(spark, tmp_path_factory, events, a1, a2):
    import uuid

    rows = [
        (lsn, op, f"k{ki}",
         None if op == "D" else nt,
         None if op == "D" else src)
        for lsn, op, ki, nt, src in events
    ]
    pdf = pd.DataFrame(rows, columns=["lsn", "op", "doc_id", "n_tok", "source"])
    pdf["n_tok"] = pdf["n_tok"].astype("Int32")
    half = len(pdf) // 2
    chunks = [pdf.iloc[:half], pdf.iloc[half:]]

    con = duckdb.connect()
    root = tmp_path_factory.mktemp(f"diffp-{uuid.uuid4().hex[:8]}")
    local = SnapshotTable.create(
        spark, str(root / "tbl"), SMALL_PAYLOAD, key="doc_id", n_buckets=2
    )
    duck = DuckDBSnapshotTable.create(con, "t", SMALL_PAYLOAD, key="doc_id")

    def merge(chunk, bid):
        if len(chunk) == 0:
            return
        sdf = spark.createDataFrame(
            chunk, schema="lsn long, op string, doc_id string,"
            " n_tok int, source string"
        )
        local.merge(reduce_latest(sdf), batch_id=bid)
        duck.merge(_duck_reduce_small(con, chunk))

    def check(stage):
        assert _small_state(local) == _small_state(duck), stage

    merge(chunks[0], 0)
    check("merge 0")
    _run_action(local, duck, a1, spark)
    check(f"action {a1}")
    merge(chunks[1], 1)
    check("merge 1")
    _run_action(local, duck, a2, spark)
    check(f"action {a2}")


def _duck_reduce_small(con, pdf):
    con.register("_rawp", pdf)
    try:
        return con.execute(
            "SELECT lsn, op, doc_id, n_tok, source FROM ("
            "  SELECT *, row_number() OVER ("
            "    PARTITION BY doc_id ORDER BY lsn DESC) AS rn FROM _rawp"
            ") WHERE rn = 1"
        ).df()
    finally:
        con.unregister("_rawp")
