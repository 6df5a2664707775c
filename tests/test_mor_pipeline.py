"""Merge-on-read pipeline: the append-then-compact group commit must be
observationally identical to per-epoch COW merges — including between
compactions, across replays, crash windows, and late events."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.generator import spark_changelog_from_pandas
from data_hub_ejp_xml_pipeline_spark.oracle import (
    assert_final_state_equal,
    expected_final_state_pandas,
)
from data_hub_ejp_xml_pipeline_spark.plans.mor_pipeline import MorPipeline
from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

COLS = ["doc_id", "tokens", "n_tok", "source", "_lsn"]


def _batches(changelog_pdf, n):
    step = len(changelog_pdf) // n + 1
    return [changelog_pdf.iloc[i * step : (i + 1) * step] for i in range(n)]


def test_mor_matches_cow_and_oracle_at_every_epoch(spark, tmp_path, changelog_pdf):
    """After EVERY epoch (staged or compacted) the MOR view equals the
    direct COW pipeline on the same prefix — and the pandas oracle."""
    mor = MorPipeline(spark, str(tmp_path / "mor"), n_buckets=8, k_compact=3)
    cow = MergePipeline(spark, str(tmp_path / "cow"), n_buckets=8)
    batches = _batches(changelog_pdf, 5)
    seen = []
    for i, pdf in enumerate(batches):
        seen.append(pdf)
        df = spark_changelog_from_pandas(spark, pdf)
        mor.apply(df, batch_id=i)
        cow.apply(spark_changelog_from_pandas(spark, pdf), batch_id=i)
        prefix = pd.concat(seen, ignore_index=True)
        a = mor.final_state().select(COLS).toPandas()
        assert_final_state_equal(a, expected_final_state_pandas(prefix))
        assert_final_state_equal(a, cow.final_state().select(COLS).toPandas())
    # epochs 0-2 compacted, 3-4 staged: base lags, view does not
    assert mor.base.manifest()["operation"].startswith("merge")
    assert len(mor.delta.manifest()["files"]) > 0


def test_mor_replayed_epoch_is_noop(spark, tmp_path, changelog_pdf):
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=8, k_compact=10)
    b0, b1 = _batches(changelog_pdf, 2)
    mor.apply(spark_changelog_from_pandas(spark, b0), batch_id=0)
    before = mor.final_state().select(COLS).toPandas()
    replay = mor.apply(spark_changelog_from_pandas(spark, b0), batch_id=0)
    assert not replay.applied
    assert_final_state_equal(mor.final_state().select(COLS).toPandas(), before)
    mor.apply(spark_changelog_from_pandas(spark, b1), batch_id=1)
    assert_final_state_equal(
        mor.final_state().select(COLS).toPandas(),
        expected_final_state_pandas(changelog_pdf),
    )


def test_mor_crash_between_merge_and_truncate_is_idempotent(
    spark, tmp_path, changelog_pdf
):
    """Simulate the crash window: compaction's base MERGE lands but the
    delta truncate does not. The next compact must re-merge the same
    staged set as a no-op (same batch id) and then truncate."""
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=8, k_compact=100)
    b0, b1 = _batches(changelog_pdf, 2)
    mor.apply(spark_changelog_from_pandas(spark, b0), batch_id=0)
    mor.apply(spark_changelog_from_pandas(spark, b1), batch_id=1)

    real_truncate = mor.delta.truncate
    mor.delta.truncate = lambda: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        mor.compact()
    base_v = mor.base.current_version()
    expected = expected_final_state_pandas(changelog_pdf)
    assert_final_state_equal(mor.final_state().select(COLS).toPandas(), expected)

    # restart: truncate works again; recompact no-ops the base
    mor.delta.truncate = real_truncate
    res = mor.compact()
    assert res is not None and not res.applied  # same compact_id → ledger no-op
    assert mor.base.current_version() == base_v
    assert mor.delta.manifest()["files"] == []
    assert_final_state_equal(mor.final_state().select(COLS).toPandas(), expected)

    # and a THIRD compact with nothing staged is a pure no-op
    assert mor.compact() is None


def test_mor_late_replay_after_compaction_cannot_resurrect(spark, tmp_path):
    """A stale delta (lower LSN than what compaction already applied) must
    lose the view's LWW reduce AND the eventual merge's guard."""
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4, k_compact=1)
    mk = lambda lsn, op, toks: (f"k", toks, len(toks), "s", op, lsn)  # noqa: E731

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source", "op", "lsn"])
        )

    mor.apply(df([mk(10, "U", [1, 2, 3])]), batch_id=0)  # k_compact=1 → compacted
    assert mor.delta.manifest()["files"] == []
    # late replay of an OLDER image arrives in the next epoch
    mor2 = MorPipeline(spark, str(tmp_path / "t"), k_compact=100)
    mor2.apply(df([mk(5, "U", [9])]), batch_id=1)
    row = mor2.final_state().collect()
    assert len(row) == 1 and row[0]["tokens"] == [1, 2, 3] and row[0]["_lsn"] == 10
    mor2.compact()
    row = mor2.final_state().collect()
    assert len(row) == 1 and row[0]["tokens"] == [1, 2, 3]


def test_mor_delete_between_compactions(spark, tmp_path):
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4, k_compact=2)

    def df(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "tokens", "n_tok", "source", "op", "lsn"])
        )

    mor.apply(df([("a", [1], 1, "s", "U", 1), ("b", [2], 1, "s", "U", 2)]), batch_id=0)
    mor.apply(df([("a", [], 0, "s", "D", 3)]), batch_id=1)  # triggers compact
    rows = {r["doc_id"] for r in mor.final_state().collect()}
    assert rows == {"b"}
    # tombstone survives in the base so later low-LSN updates cannot revive
    mor.apply(df([("a", [7], 1, "s", "U", 2)]), batch_id=2)
    rows = {r["doc_id"] for r in mor.final_state().collect()}
    assert rows == {"b"}


def test_truncate_is_metadata_only_and_ledger_preserving(spark, tmp_path, changelog_df):
    from data_hub_ejp_xml_pipeline_spark.schemas import TARGET_SCHEMA
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    payload = T.StructType([f for f in TARGET_SCHEMA.fields if f.name != "_lsn"])
    t = SnapshotTable.create(spark, str(tmp_path / "t"), payload, n_buckets=4)
    t.append(changelog_df.limit(100), batch_id=0)
    v = t.current_version()
    res = t.truncate()
    assert res.applied and t.current_version() == v + 1
    assert t.read().count() == 0
    # replayed pre-truncate epoch still no-ops
    replay = t.append(changelog_df.limit(100), batch_id=0)
    assert not replay.applied and t.read().count() == 0
    # time travel still sees the pre-truncate data
    assert t.read(version=v).count() > 0


def test_mor_apply_requires_batch_id(spark, tmp_path, changelog_df):
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4)
    with pytest.raises(ValueError, match="batch_id"):
        mor.apply(changelog_df.limit(10))


def test_mor_empty_epoch_is_noop_and_does_not_trigger_compaction(
    spark, tmp_path, changelog_pdf
):
    """Reference F4 on the append path: an empty epoch mints no delta
    snapshot, no ledger entry, and no compaction-counter tick."""
    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4, k_compact=2)
    mor.apply(
        spark_changelog_from_pandas(spark, changelog_pdf.iloc[:200]), batch_id=0
    )
    v = mor.delta.current_version()
    res = mor.apply(spark_changelog_from_pandas(spark, changelog_pdf.iloc[0:0]),
                    batch_id=1)
    assert not res.applied and res.n_events == 0
    assert mor.delta.current_version() == v
    assert len(mor.delta.manifest()["files"]) > 0  # still staged, not compacted


def test_mor_view_shows_column_added_in_staged_epoch(spark, tmp_path):
    """Schema evolution during STAGED epochs is visible in the merge-view
    before any compaction folds it into the base."""
    import pandas as pd
    from pyspark.sql import functions as F

    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4, k_compact=100)

    def df(rows, extra=False):
        cols = ["doc_id", "tokens", "n_tok", "source", "op", "lsn"]
        out = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
        return out.withColumn("lang", F.lit("en")) if extra else out

    mor.apply(df([("a", [1], 1, "s", "U", 1)]), batch_id=0)
    mor.apply(df([("b", [2], 1, "s", "U", 2)], extra=True), batch_id=1)
    view = mor.final_state()
    assert "lang" in view.columns
    got = {r["doc_id"]: r["lang"] for r in view.collect()}
    assert got == {"a": None, "b": "en"}
    # and after compaction the base agrees with the view
    mor.compact()
    base_got = {r["doc_id"]: r["lang"] for r in mor.final_state().collect()}
    assert base_got == got


def test_pipelines_adopt_existing_table_key(spark, tmp_path):
    """Re-opening a table keyed on something other than doc_id must reduce
    on the MANIFEST key, not the constructor default — otherwise the merge
    receives un-reduced batches and fans out duplicates."""
    import pandas as pd
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.plans.pipeline import MergePipeline

    payload = T.StructType(
        [T.StructField("entity_id", T.StringType()), T.StructField("v", T.LongType())]
    )
    root = str(tmp_path / "t")
    p1 = MergePipeline(spark, root, key="entity_id", payload_schema=payload,
                       n_buckets=4)
    batch = spark.createDataFrame(
        pd.DataFrame(
            {"entity_id": ["x", "x"], "v": [1, 2], "op": ["U", "U"], "lsn": [1, 2]}
        )
    )
    p1.apply(batch, batch_id=0)
    # reopen WITHOUT passing the key: manifest key must win over "doc_id"
    p2 = MergePipeline(spark, root, n_buckets=4, payload_schema=payload)
    assert p2.key == "entity_id"
    p2.apply(
        spark.createDataFrame(
            pd.DataFrame(
                {"entity_id": ["x", "y"], "v": [3, 9], "op": ["U", "U"],
                 "lsn": [3, 4]}
            )
        ),
        batch_id=1,
    )
    rows = {r["entity_id"]: r["v"] for r in p2.final_state().collect()}
    assert rows == {"x": 3, "y": 9}  # one row per key — no fan-out


def test_key_column_never_widens(spark, tmp_path):
    """A batch whose KEY arrives wider (long vs int) must NOT widen the
    key column — bucket hashes differ between int and long, so widening
    would strand existing rows in stale-hash buckets. Incoming keys cast
    to the existing type; the payload still widens normally."""
    import pandas as pd
    from pyspark.sql import types as T

    from data_hub_ejp_xml_pipeline_spark.table import SnapshotTable

    payload = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())]
    )
    table = SnapshotTable.create(spark, str(tmp_path / "t"), payload, key="k",
                                 n_buckets=4)

    def batch(rows, ktype, vtype):
        schema = T.StructType(
            [T.StructField("k", ktype), T.StructField("v", vtype),
             T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
        )
        return spark.createDataFrame(rows, schema)

    table.merge(batch([(42, 1, "U", 1)], T.IntegerType(), T.IntegerType()), batch_id=0)
    table.merge(batch([(42, 3_000_000_000, "U", 2)], T.LongType(), T.LongType()),
                batch_id=1)
    types = {f.name: f.dataType for f in table.schema().fields}
    assert types["k"] == T.IntegerType()  # key pinned
    assert types["v"] == T.LongType()  # payload widened
    rows = table.read().collect()
    assert len(rows) == 1  # the update found the existing row — no phantom dup
    assert rows[0]["v"] == 3_000_000_000


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_mor_random_interleavings_match_oracle(spark, tmp_path, changelog_pdf, seed):
    """Seeded fuzz: random epoch sizes, random replays, random explicit
    compactions, random k_compact — every interleaving must land on the
    full-replay oracle."""
    import numpy as np

    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, 5))
    mor = MorPipeline(spark, str(tmp_path / f"t{seed}"), n_buckets=4, k_compact=k)
    n = len(changelog_pdf)
    edges = sorted(rng.choice(range(1, n), size=4, replace=False)) + [n]
    lo = 0
    applied = []
    for i, hi in enumerate(edges):
        mor.apply(spark_changelog_from_pandas(spark, changelog_pdf.iloc[lo:hi]),
                  batch_id=i)
        applied.append((i, lo, hi))
        lo = hi
        if rng.random() < 0.4 and applied:  # replay a random earlier epoch
            j, rlo, rhi = applied[int(rng.integers(0, len(applied)))]
            res = mor.apply(
                spark_changelog_from_pandas(spark, changelog_pdf.iloc[rlo:rhi]),
                batch_id=j,
            )
            assert not res.applied
        if rng.random() < 0.3:
            mor.compact()
    assert_final_state_equal(
        mor.final_state().select(COLS).toPandas(),
        expected_final_state_pandas(changelog_pdf),
    )


def test_racing_compactors_one_wins_cas(spark, tmp_path, changelog_pdf):
    """Two compactors over the same roots: the loser's base merge must
    fail the manifest CAS (ConcurrentCommitError) or no-op as a replay —
    never double-apply — and a follow-up compact converges cleanly."""
    from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import (
        ConcurrentCommitError,
    )

    root = str(tmp_path / "t")
    a = MorPipeline(spark, root, n_buckets=4, k_compact=100)
    b0, b1 = _batches(changelog_pdf, 2)
    a.apply(spark_changelog_from_pandas(spark, b0), batch_id=0)
    a.apply(spark_changelog_from_pandas(spark, b1), batch_id=1)
    b = MorPipeline(spark, root, k_compact=100)

    res_a = a.compact()
    assert res_a is not None and res_a.applied
    try:
        res_b = b.compact()
        # b ran after a's commit+truncate: nothing staged (None) or a
        # ledger-replay no-op — both are converged outcomes
        assert res_b is None or not res_b.applied
    except ConcurrentCommitError:
        pass  # b raced into the same parent version and lost the CAS
    assert_final_state_equal(
        a.final_state().select(COLS).toPandas(),
        expected_final_state_pandas(changelog_pdf),
    )


def test_mor_heals_missing_delta_table(spark, tmp_path, changelog_pdf):
    """Crash between base-create and delta-create: reopening the root must
    recreate the (necessarily empty) delta table instead of failing on the
    first delta read."""
    import shutil

    root = tmp_path / "heal"
    MorPipeline(spark, str(root), n_buckets=4, k_compact=10)
    shutil.rmtree(root / "delta")  # simulate the crash window
    mor = MorPipeline(spark, str(root), n_buckets=4, k_compact=10)
    b0, _ = _batches(changelog_pdf, 2)
    mor.apply(spark_changelog_from_pandas(spark, b0), batch_id=0)
    assert_final_state_equal(
        mor.final_state().select(COLS).toPandas(), expected_final_state_pandas(b0)
    )
    # the healed delta inherits the base's bucket layout
    assert mor.delta.manifest()["n_buckets"] == mor.base.manifest()["n_buckets"]


def test_mor_staged_epoch_count_survives_restart(spark, tmp_path, changelog_pdf):
    """The compaction trigger is derived from the delta ledger, not
    process-local state: k_compact-1 epochs before a restart plus one
    after must compact — a process-local counter would let up to
    2*k_compact-1 epochs stage (unbounded read amplification on the
    documented k_compact bound)."""
    root = str(tmp_path / "restart")
    batches = _batches(changelog_pdf, 4)
    mor1 = MorPipeline(spark, root, n_buckets=4, k_compact=3)
    for i in range(2):
        mor1.apply(spark_changelog_from_pandas(spark, batches[i]), batch_id=i)
    assert len(mor1.delta.manifest()["files"]) > 0  # 2 staged, not compacted

    mor2 = MorPipeline(spark, root, k_compact=3)  # restart
    assert mor2._since_compact == 2
    mor2.apply(spark_changelog_from_pandas(spark, batches[2]), batch_id=2)
    # third epoch triggered the compaction: deltas folded, table truncated
    assert mor2.delta.manifest()["operation"] == "truncate"
    assert mor2._since_compact == 0
    assert_final_state_equal(
        mor2.final_state().select(COLS).toPandas(),
        expected_final_state_pandas(pd.concat(batches[:3], ignore_index=True)),
    )
    # a restart that lands ABOVE the threshold compacts immediately on open
    mor3 = MorPipeline(spark, root, k_compact=1)
    mor3.apply(spark_changelog_from_pandas(spark, batches[3]), batch_id=3)
    mor4 = MorPipeline(spark, root, k_compact=1)
    assert mor4._since_compact == 0


def test_mor_heal_uses_base_manifest_schema(spark, tmp_path):
    """The healed delta must inherit the BASE's stored payload schema, not
    the constructor default — the root is typically reopened without
    re-passing a custom schema."""
    import shutil

    from pyspark.sql import types as T

    custom = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ])
    root = tmp_path / "healsch"
    MorPipeline(spark, str(root), n_buckets=4, payload_schema=custom)
    shutil.rmtree(root / "delta")
    mor = MorPipeline(spark, str(root), n_buckets=4)  # no schema re-passed
    got = {f.name: f.dataType.simpleString()
           for f in mor.delta.schema().fields if f.name != "op"}
    want = {f.name: f.dataType.simpleString() for f in custom.fields}
    # delta payload = base payload (custom), plus the op column
    assert {k: v for k, v in got.items() if k in want} == want
    assert "op" in [f.name for f in mor.delta.schema().fields]
    assert "tokens" not in got  # the default PAYLOAD_SCHEMA did NOT leak in


def test_mor_verify_fsck_and_view_invariant(spark, tmp_path, changelog_pdf):
    """MorPipeline.verify (round 6): base + delta fsck aggregate, and the
    deep merge-view invariant — the view must equal an independent LWW
    re-derivation over base ∪ delta. A vanished delta file is caught."""
    import os

    mor = MorPipeline(spark, str(tmp_path / "t"), n_buckets=4, k_compact=3)
    for i, pdf in enumerate(_batches(changelog_pdf, 5)):
        mor.apply(spark_changelog_from_pandas(spark, pdf), batch_id=i)
    chk = mor.verify(deep=True)
    assert chk["ok"], chk
    assert chk["view_mismatches"] == 0
    assert chk["base"]["ok"] and chk["delta"]["ok"]

    # break a staged delta file on disk: fsck reports, never raises
    victim = os.path.join(mor.delta.root, mor.delta.manifest()["files"][0]["path"])
    os.remove(victim)
    chk2 = mor.verify()
    assert not chk2["ok"]
    assert any("missing data file" in e for e in chk2["delta"]["errors"])
