"""Persistent IVF index: frozen centroids, exactly-once epoch appends,
bucket-pruned probes, recall, retrain maintenance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.plans.ann_index import IvfIndexState


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((80, 8)).astype("float32")
    vecs[1] = vecs[0] * 1.001  # a guaranteed near-dup pair
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _queries(emb, n=3):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )


def test_train_apply_query_and_recall(spark, tmp_path, emb):
    idx = IvfIndexState(spark, str(tmp_path / "idx"), n_centroids=6, n_buckets=8)
    assert not idx.trained
    with pytest.raises(RuntimeError, match="train"):
        idx.apply(emb, batch_id=0)
    idx.train(emb.filter("vec_id < 40"))
    assert idx.trained
    idx.apply(emb.filter("vec_id < 40"), batch_id=0)
    idx.apply(emb.filter("vec_id >= 40"), batch_id=1)
    assert idx.lists.read().count() == 80

    top = idx.query(_queries(emb), k=3, n_probe=2).collect()
    by_q = {r.query_id: r for r in top if r.rank == 1}
    # the near-identical twin shares every centroid preference → found
    assert by_q[0].neighbor_id == "1" and by_q[1].neighbor_id == "0"

    # replayed epoch no-ops on the ledger
    idx.apply(emb.filter("vec_id >= 40"), batch_id=1)
    assert idx.lists.read().count() == 80


def test_query_reads_only_probed_buckets(spark, tmp_path, emb):
    """The probe path must file-prune: reading with the probed cids'
    buckets touches a strict subset of the lists files, and that pruned
    read still contains every probed cid's full list."""
    idx = IvfIndexState(spark, str(tmp_path / "prune"), n_centroids=8, n_buckets=8)
    idx.train(emb)
    idx.apply(emb, batch_id=0)
    cids = [r.cid for r in idx.centroids.read().select("cid").collect()]
    # the 8 cids must span >1 bucket for pruning to be observable at all
    assert len(idx._buckets_for_cids(cids)) >= 2
    # probe ONE cid: its bucket's files are a strict subset of the table
    one = [cids[0]]
    buckets = idx._buckets_for_cids(one)
    assert len(buckets) == 1
    m = idx.lists.manifest()
    file_buckets = {f["bucket"] for f in m["files"]}
    pruned_files = [f for f in m["files"] if f["bucket"] in buckets]
    if len(file_buckets) > 1:  # murmur spread: all-but-certain with 8 cids
        assert 0 < len(pruned_files) < len(m["files"])
    pruned = idx.lists.read(buckets=buckets)
    full = idx.lists.read().filter(F.col("cid").isin(one))
    assert pruned.filter(F.col("cid").isin(one)).count() == full.count()


def test_reopen_identity_and_retrain(spark, tmp_path, emb):
    root = str(tmp_path / "ident")
    idx = IvfIndexState(spark, root, n_centroids=4, n_buckets=4)
    idx.train(emb)
    idx.apply(emb, batch_id=0)
    q1 = sorted(map(tuple, idx.query(_queries(emb), k=2).collect()))

    # reopen: frozen centroids adopted; train() is a no-op; same answers
    idx2 = IvfIndexState(spark, root, n_centroids=4, n_buckets=4)
    idx2.train(emb.filter("vec_id > 50"))  # must NOT move the centroids
    assert sorted(map(tuple, idx2.query(_queries(emb), k=2).collect())) == q1
    with pytest.raises(ValueError, match="n_centroids"):
        IvfIndexState(spark, root, n_centroids=8, n_buckets=4)

    # retrain rebuilds centroids AND lists together
    idx2.retrain(emb)
    assert idx2.lists.read().count() == 80
    top = {r.query_id: r.neighbor_id
           for r in idx2.query(_queries(emb), k=1).collect()}
    assert top[0] == "1"
