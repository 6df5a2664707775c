"""Persistent IVF ANN index: frozen centroids + inverted lists as tables.

``operators.similarity.ann_ivf`` recomputes centroids and lists per query
— right for one-shot analytics, wrong for a serving corpus that grows by
CDC epochs. This module persists both halves:

* **centroids** — trained ONCE (optionally on a deterministic hash
  sample) and frozen; retraining is an explicit maintenance op
  (:meth:`retrain`), because silently moving centroids would strand
  every previously-assigned vector in a stale list.
* **inverted lists** — a :class:`SnapshotTable` KEYED BY ``cid``: the
  bucket function routes each centroid's list into a fixed bucket
  directory, so a query that probes ``n_probe`` centroids reads ONLY
  those buckets' files (``SnapshotTable.read(buckets=...)`` — file-level
  pruning off the manifest, no full-corpus scan). Epoch appends are
  exactly-once on the table's batch-id ledger.

100 TB shape: queries touch O(n_probe / n_centroids) of the corpus
bytes; the per-epoch apply is one broadcast-assign (centroids are tiny)
plus one bucketed append — no shuffle of the existing lists, ever.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_hub_ejp_xml_pipeline_spark.operators.similarity import (
    _argmin_centroid,
    _topk_per_query,
    cosine,
    ivf_centroids,
)
from data_hub_ejp_xml_pipeline_spark.table.snapshot_table import SnapshotTable

CENTROID_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.IntegerType()),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
    ]
)

LIST_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.IntegerType()),
        T.StructField("vec_id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


class IvfIndexState:
    """Durable IVF index over an embedding corpus that grows by epochs."""

    def __init__(self, spark: SparkSession, root: str, n_centroids: int = 8,
                 n_buckets: int = 16, train_fraction: float = 1.0):
        self.spark = spark
        self.root = root
        meta_path = os.path.join(root, "ann_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            if n_centroids != meta["n_centroids"]:
                raise ValueError(
                    f"index at {root} was built with n_centroids="
                    f"{meta['n_centroids']}; assignments are not portable "
                    f"across centroid counts — use retrain()"
                )
        else:
            os.makedirs(root, exist_ok=True)
            with open(meta_path, "w") as fh:
                json.dump({"n_centroids": n_centroids}, fh)
        self.n_centroids = n_centroids
        self.train_fraction = train_fraction
        self.centroids = self._open(root + "/centroids", CENTROID_SCHEMA, "cid",
                                    n_buckets=1)
        # lists keyed by cid: probes prune to the probed cids' buckets
        self.lists = self._open(root + "/lists", LIST_SCHEMA, "cid", n_buckets)

    def _open(self, root: str, schema: T.StructType, key: str,
              n_buckets: int) -> SnapshotTable:
        if SnapshotTable.exists(root):
            return SnapshotTable(self.spark, root)
        return SnapshotTable.create(self.spark, root, schema, key=key,
                                    n_buckets=n_buckets)

    # ------------------------------------------------------------ training
    @property
    def trained(self) -> bool:
        return bool(self.centroids.manifest()["files"])

    def train(self, corpus: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding") -> None:
        """Train + freeze the centroids (idempotent: a no-op when already
        trained — replaying a bootstrap cannot silently move them)."""
        if self.trained:
            return
        cents = ivf_centroids(
            corpus, self.n_centroids, id_col=id_col, vec_col=vec_col,
            train_fraction=self.train_fraction,
        )
        self.centroids.append(cents.select(
            F.col("cid").cast("int").alias("cid"), "centroid"
        ))

    def retrain(self, corpus: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> None:
        """Explicit maintenance: new centroids AND a full list rebuild in
        one pass (stale assignments against moved centroids would
        silently destroy recall — the two must change together)."""
        self.centroids.truncate()
        self.lists.truncate()
        self.train(corpus, id_col, vec_col)
        self.apply(corpus, batch_id=None, id_col=id_col, vec_col=vec_col)

    # -------------------------------------------------------------- ingest
    def apply(self, batch: DataFrame, batch_id: int | None,
              id_col: str = "vec_id", vec_col: str = "embedding"):
        """Assign a batch against the FROZEN centroids and append to the
        inverted lists — broadcast-assign (centroids are tiny) + one
        bucketed append; the existing lists never shuffle. Exactly-once
        per ``batch_id``."""
        if not self.trained:
            raise RuntimeError("train() the index before applying epochs")
        cents = self.centroids.read().select("cid", "centroid")
        # the vector rides the argmin (carry) — no join-back against the
        # batch to re-attach it
        assigned = _argmin_centroid(
            batch.select(F.col(id_col).alias("vec_id"),
                         F.col(vec_col).alias("_v")),
            cents, "vec_id", "_v", carry="_v",
        )
        rows = assigned.select(
            F.col("cid").cast("int").alias("cid"),
            F.col("vec_id").cast("string").alias("vec_id"),
            F.col("_v").cast("array<float>").alias("embedding"),
        )
        return self.lists.append(rows, batch_id=batch_id)

    # --------------------------------------------------------------- serve
    def _buckets_for_cids(self, cids: list[int]) -> set[int]:
        """The lists-table buckets holding these cids — one tiny local
        job over |cids| rows (bounded by n_centroids), reusing the
        table's OWN bucket expression so hash/format drift is impossible."""
        df = self.spark.createDataFrame(
            [(int(c),) for c in cids], "cid int"
        ).select(self.lists._bucket_expr("cid").alias("b"))
        return {r.b for r in df.collect()}

    def query(self, queries: DataFrame, k: int = 5, n_probe: int = 3) -> DataFrame:
        """Top-k neighbors per query row (``query_id``, ``qe``): probe the
        ``n_probe`` nearest centroids, read ONLY those lists' buckets
        (file-pruned scan), rerank exactly. The probed-cid collect is
        O(n_centroids) — never data-sized. Raises on an untrained index
        (like :meth:`apply`) rather than silently returning zero rows."""
        if not self.trained:
            raise RuntimeError("train() the index before querying")
        cents = self.centroids.read().select("cid", "centroid")
        probe_scored = queries.join(F.broadcast(cents)).select(
            "query_id", "qe", "cid",
            F.round(cosine(F.col("qe"), F.col("centroid")), 6).alias("csim"),
        )
        from pyspark.sql import Window as W

        wq = W.partitionBy("query_id").orderBy(F.col("csim").desc(), "cid")
        probes = (
            probe_scored.withColumn("_rn", F.row_number().over(wq))
            .filter(F.col("_rn") <= n_probe)
            .select("query_id", "qe", "cid")
        )
        probed_cids = [r.cid for r in probes.select("cid").distinct().collect()]
        if not probed_cids:
            # empty-queries short-circuit: schema must match the non-empty
            # path exactly — query_id in the CALLER's type, neighbor_id
            # string (vec_id is stored as string) — so unions across the
            # two branches never mismatch
            return self.spark.createDataFrame(
                [],
                T.StructType([
                    T.StructField("query_id",
                                  queries.schema["query_id"].dataType),
                    T.StructField("neighbor_id", T.StringType()),
                    T.StructField("rank", T.IntegerType(), False),
                    T.StructField("cosine", T.DoubleType()),
                ]),
            )
        lists = self.lists.read(buckets=self._buckets_for_cids(probed_cids))
        scored = F.broadcast(probes).join(
            lists,
            (probes["cid"] == lists["cid"])
            & (lists["vec_id"] != probes["query_id"].cast("string")),
        ).select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("sim6"),
        )
        return _topk_per_query(scored, k, local_prefilter=False)
