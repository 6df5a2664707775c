"""Training-data operators: dedup family recall properties, similarity
search, multimodal plumbing, text analysis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_hub_ejp_xml_pipeline_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "spark makes big data small again with catalyst and tungsten engines"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("small", "tiny")),  # near dup of 0
        (3, "completely different content about cooking pasta at home today"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(spark, docs):
    out = {r.keep_doc_id: r.n_copies for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 identical
    assert sum(out.values()) == 5


def test_jaccard_and_minhash_find_neardups(spark, docs):
    jac = dedup.jaccard_pairs(docs, threshold=0.5).collect()
    pairs = {(r.doc_a, r.doc_b) for r in jac}
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)

    mh = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh}
    assert (0, 1) in mh_pairs  # identical docs always collide in every band
    # LSH candidates are a subset of exact-verified pairs
    assert mh_pairs <= pairs


def test_simhash_properties(spark, docs):
    sig = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    assert sig[0] == sig[1]  # identical text → identical signature
    assert 0 <= sig[0] < (1 << dedup.SIMHASH_BITS)
    pairs = dedup.simhash_neardup_pairs(docs, max_hamming=3).collect()
    assert any((r.doc_a, r.doc_b) == (0, 1) and r.hamming == 0 for r in pairs)


def test_ann_brute_force_and_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((40, 8)).astype("float32")
    vecs[1] = vecs[0] * 1.001  # near-identical pair
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    top = similarity.ann_brute_force(emb, queries, k=3).collect()
    assert top[0].neighbor_id == 1 and top[0].rank == 1  # finds the near-dup

    planes = similarity.hyperplanes(6, 8, seed=1)
    lsh = similarity.ann_lsh(emb, queries, planes, k=3).collect()
    # near-identical vectors share every hyperplane sign → same bucket
    assert any(r.neighbor_id == 1 and r.rank == 1 for r in lsh)


def test_multimodal_plumbing(spark, docs):
    media = multimodal.attach_binary_payload(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 5
    by_id = {r.media_id: r for r in feats}
    assert by_id["0"].feature == by_id["1"].feature  # deterministic decode
    assert by_id["0"].n_bytes == len(by_id["0"].feature) and False or by_id["0"].n_bytes > 0
    assert len(by_id["0"].feature) == 8

    with pytest.raises(Exception) as exc:
        multimodal.extract_features(media, decode_mode="strict").collect()
    assert "NotImplementedError" in str(exc.value) or "decode" in str(exc.value)


def test_text_operators(spark, docs):
    q = text.quality_metrics(docs, n_chars_col=None).collect()
    assert all(r.n_words > 0 and r.quality_label in ("good", "low") for r in q)
    langs = text.lang_id(docs).collect()
    assert all(r.pred_lang in ("en", "de", "fr", "es", "unk") for r in langs)
    counts = text.token_counts(docs).collect()
    assert all(r.re_tokens >= r.ws_tokens for r in counts)
    fp = docs.select(text.fingerprint("text").alias("f")).collect()
    assert len({r.f for r in fp}) == 4  # docs 0,1 share a fingerprint


def test_ann_ivf_recall_vs_brute_force(spark):
    """IVF is approximate; sanity-check recall@k against the exact scan."""
    from data_hub_ejp_xml_pipeline_spark.queries import (
        q_ann_brute_force,
        q_ann_ivf,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        (r.query_id, r.neighbor_id)
        for r in q_ann_brute_force(spark, sf).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in q_ann_ivf(spark, sf).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.2f}"


def test_multimodal_resize_and_frame_sample(spark):
    """Resize and frame-sample plumbing: schema, meta update, deterministic
    replay, in-batch explode."""
    import pytest

    from data_hub_ejp_xml_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    media = attach_binary_payload(docs, "doc_id", "text", media_type="video")

    resized = resize_images(media, width=4, height=3).collect()
    assert len(resized) == 3
    for r in resized:
        assert r.meta.width == 4 and r.meta.height == 3
        assert r.meta.format == "raw-resized"
        assert len(bytes(r.payload)) == 12
    # deterministic across runs (replay-stable)
    again = resize_images(media, width=4, height=3).collect()
    assert {r.media_id: bytes(r.payload) for r in resized} == {
        r.media_id: bytes(r.payload) for r in again
    }

    frames = sample_frames(media, frame_interval_ms=40).toPandas()
    per = frames.groupby("media_id").size()
    assert (per >= 2).all() and (per <= 7).all()
    f0 = frames[frames.media_id == "1"].sort_values("frame_no")
    assert list(f0["frame_ts_ms"]) == [i * 40 for i in range(len(f0))]
    # frame payloads digest-chained → all distinct
    assert frames["payload"].map(bytes).nunique() == len(frames)

    # strict mode refuses (no media libs in this container)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        resize_images(media, 2, 2, decode_mode="strict").collect()


def test_ann_lsh_multiprobe_dominates_single_probe(spark):
    """Multiprobe candidates are a superset of single-probe candidates
    (the exact bucket is one of the probes) → recall can only improve."""
    from data_hub_ejp_xml_pipeline_spark.queries import (
        q_ann_brute_force,
        q_ann_lsh,
        q_ann_lsh_multiprobe,
    )

    sf = "/root/testdata/sf0.001"
    exact = {(r.query_id, r.neighbor_id) for r in q_ann_brute_force(spark, sf).collect()}
    single = {(r.query_id, r.neighbor_id) for r in q_ann_lsh(spark, sf).collect()}
    multi = {(r.query_id, r.neighbor_id) for r in q_ann_lsh_multiprobe(spark, sf).collect()}
    assert len(exact & multi) >= len(exact & single)


def test_ann_topk_prefilter_plan_and_equivalence(spark):
    """ann_brute_force must not funnel a query's full candidate set through
    one reducer: the executed plan carries a map-side MapInPandas local
    top-k BEFORE the final rank window's exchange, and the prefiltered
    result equals the window-only result exactly (every global top-k row
    is top-k in its own batch)."""
    from data_hub_ejp_xml_pipeline_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = spark.range(0, 4000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda j: F.sin((F.col("id") + 1) * (j + 1) * 0.37),
        ).cast("array<float>").alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") % 997 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    out = similarity.ann_brute_force(emb, queries, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # local top-k before the window exchange

    sims = F.broadcast(queries).join(
        emb, F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(similarity.cosine(F.col("qe"), F.col("embedding")), 6).alias("sim6"),
    )
    unfiltered = similarity._topk_per_query(sims, 4, local_prefilter=False)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[2])) == sorted(
        map(tuple, unfiltered.collect()), key=lambda t: (t[0], t[2])
    )


def test_multimodal_kernel_seam(spark):
    """The injected-kernel seam: a real PIL/pyav decoder drops in without
    touching the operator. The fake kernels assert the contract — whole
    Arrow batch as list[bytes] in, one output per payload out — and their
    outputs flow through schema/explode plumbing unchanged."""
    from pyspark.sql import functions as F

    from data_hub_ejp_xml_pipeline_spark.operators import multimodal as mm

    docs = spark.range(0, 40).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )
    media = mm.attach_binary_payload(docs, "doc_id", "text")

    def feat_kernel(payloads):
        assert isinstance(payloads, list) and all(
            isinstance(p, bytes) for p in payloads
        )
        return [[float(len(p)), float(p[0])] for p in payloads]

    feats = {r.media_id: r for r in mm.extract_features(media, dim=2, kernel=feat_kernel).collect()}
    assert len(feats) == 40
    assert feats["7"].feature == [float(len(b"payload-7")), float(b"p"[0])]

    def resize_kernel(payloads, w, h):
        assert (w, h) == (3, 2)
        return [p[: w * h] for p in payloads]

    resized = {r.media_id: r for r in mm.resize_images(media, 3, 2, kernel=resize_kernel).collect()}
    assert bytes(resized["7"].payload) == b"payloa"
    assert resized["7"].meta.n_bytes == 6  # actual kernel output size
    assert (resized["7"].meta.width, resized["7"].meta.height) == (3, 2)

    def frame_kernel(payloads, interval_ms):
        assert interval_ms == 500
        return [[p, p[::-1]] for p in payloads]  # 2 frames per media

    frames = mm.sample_frames(media, 500, kernel=frame_kernel).collect()
    assert len(frames) == 80
    f7 = sorted(
        (r for r in frames if r.media_id == "7"), key=lambda r: r.frame_no
    )
    assert [r.frame_ts_ms for r in f7] == [0, 500]
    assert bytes(f7[1].payload) == b"payload-7"[::-1]

    # length-contract violation surfaces as an error, not silent drift
    import pytest

    bad = mm.extract_features(media, kernel=lambda ps: [[1.0]] * (len(ps) - 1))
    with pytest.raises(Exception, match="outputs for"):
        bad.collect()


def test_incremental_minhash_flags_corpus_and_batch(spark, docs):
    """CDC-shaped dedup: corpus = docs 0,3; batch = docs 1,2,4. Doc 1
    (exact dup of corpus 0) must flag against the CORPUS via its
    precomputed band state (identical docs always share every band, so
    this is recall-deterministic); nothing flags doc 4. Batch-internal:
    adding doc 1's twin later in the same batch flags it against the
    EARLIER batch doc AND the corpus twin."""
    corpus = docs.filter(F.col("doc_id").isin(0, 3))
    batch = docs.filter(F.col("doc_id").isin(1, 2, 4))
    state = dedup.minhash_band_state(corpus)

    flags = dedup.incremental_minhash_flags(batch, corpus, state, threshold=0.8)
    rows = {(r.new_doc, r.matched_doc): (r.matched_in, r.jaccard)
            for r in flags.collect()}
    assert rows[(1, 0)][0] == "corpus" and rows[(1, 0)][1] == 1.0
    assert not any(n == 4 for (n, _) in rows)

    # batch-internal pair: docs 1 and 5 are twins inside one batch
    batch2 = batch.union(
        spark.createDataFrame(
            [(5, docs.filter(F.col("doc_id") == 0).first().text)],
            ["doc_id", "text"],
        )
    )
    flags2 = dedup.incremental_minhash_flags(batch2, corpus, state, threshold=0.8)
    rows2 = {(r.new_doc, r.matched_doc): r.matched_in for r in flags2.collect()}
    assert rows2[(5, 1)] == "batch"  # earlier batch doc wins the pair
    assert rows2[(5, 0)] == "corpus"  # and the corpus twin is also reported


def test_incremental_minhash_reingested_id_does_not_dilute_verify(spark):
    """A doc_id present on BOTH sides (re-ingestion with content drift)
    must not pool both versions' shingles under one id in the verify —
    that inflates sizes and under-reports jaccard. Batch doc 20 is an
    exact copy of CORPUS doc 10, while the batch also re-ingests doc 10
    with totally different text: the (20, 10) corpus pair must verify at
    jaccard 1.0 against the CORPUS version of doc 10."""
    text = "alpha beta gamma delta epsilon zeta eta theta"
    drift = "one two three four five six seven eight nine ten eleven twelve"
    corpus = spark.createDataFrame([(10, text)], ["doc_id", "text"])
    batch = spark.createDataFrame([(10, drift), (20, text)], ["doc_id", "text"])
    state = dedup.minhash_band_state(corpus)
    flags = dedup.incremental_minhash_flags(batch, corpus, state, threshold=0.8)
    rows = {(r.new_doc, r.matched_doc, r.matched_in): r.jaccard
            for r in flags.collect()}
    assert rows[(20, 10, "corpus")] == 1.0
    # output id columns keep the caller's (integer) type
    assert dict(flags.dtypes)["new_doc"] == "bigint"
    assert dict(flags.dtypes)["matched_doc"] == "bigint"


def test_incremental_minhash_state_reuse_matches_batch_recompute(spark, docs):
    """Flags computed against appended per-epoch band state equal flags
    against state rebuilt from scratch — the state table is a faithful
    incremental accumulator."""
    c1 = docs.filter(F.col("doc_id").isin(0))
    c2 = docs.filter(F.col("doc_id").isin(3))
    batch = docs.filter(F.col("doc_id").isin(1, 2, 4))
    appended = dedup.minhash_band_state(c1).union(dedup.minhash_band_state(c2))
    rebuilt = dedup.minhash_band_state(c1.union(c2))
    corpus = c1.union(c2)
    f_app = sorted(map(tuple, dedup.incremental_minhash_flags(
        batch, corpus, appended).collect()))
    f_reb = sorted(map(tuple, dedup.incremental_minhash_flags(
        batch, corpus, rebuilt).collect()))
    assert f_app == f_reb and len(f_app) >= 1


def test_repetition_metrics_shapes(spark):
    rows = [
        (0, "spam spam spam spam spam unique"),          # top-unigram heavy
        (1, "a b a b a b a b a b"),                      # duplicate bigrams
        (2, "every word here appears exactly once okay"),
        (3, "single"),                                    # no bigrams → 0.0
    ]
    out = {
        r.doc_id: r
        for r in text.repetition_metrics(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[0].repetition_label == "repetitive" and out[0].top_unigram_frac > 0.8
    assert out[1].repetition_label == "repetitive" and out[1].dup_bigram_frac > 0.7
    assert out[2].repetition_label == "ok"
    assert out[3].dup_bigram_frac == 0.0 and out[3].n_words == 1


def test_connected_components_shapes(spark):
    """Cliques, chains, singletons; label = min reachable id."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 99]],
                                  ["node"])
    got = {r.node: r.comp for r in dedup.connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
                   23: 20, 99: 99}


def test_connected_components_refuses_unconverged(spark):
    """A chain longer than max_iter rounds must raise, never return wrong
    clusters silently."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(10)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(chain, max_iter=2)
    # and with enough rounds the same chain resolves to one component
    got = {r.node: r.comp for r in dedup.connected_components(chain, max_iter=15).collect()}
    assert set(got.values()) == {0}


def test_neardup_clusters_end_to_end(spark, docs):
    pairs = dedup.jaccard_pairs(docs, threshold=0.5)
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.neardup_clusters(docs, pairs).collect()}
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True) and out[4] == (4, True)
    # exactly one canonical per cluster
    canon = [d for d, (_, c) in out.items() if c]
    assert sorted(canon) == [0, 3, 4]


def test_connected_components_frees_intermediate_checkpoints(spark):
    """Multi-round propagation must not accumulate checkpoint blocks:
    after the run, at most the FINAL labels table's blocks remain
    persisted (plus nothing from `und`, which is explicitly unpersisted).
    A long chain forces many rounds, so a leak is O(rounds) new ids."""
    from data_hub_ejp_xml_pipeline_spark.operators.dedup import (
        _persistent_rdd_ids,
        connected_components,
    )

    n = 12  # chain 0-1-2-...-12 → ~n rounds of min-label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"]
    )
    before = _persistent_rdd_ids(spark.sparkContext)
    cc = connected_components(edges, max_iter=2 * n)
    rows = {r.node: r.comp for r in cc.collect()}
    assert rows == {i: 0 for i in range(n + 1)}
    leaked = _persistent_rdd_ids(spark.sparkContext) - before
    assert len(leaked) <= 1, f"checkpoint blocks leaked: {sorted(leaked)}"


def test_ivf_train_fraction_guards(spark):
    """A fraction that quantizes to an empty sample must raise, not return
    zero neighbors silently; out-of-range fractions are refused."""
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="empty sample"):
        similarity.ivf_centroids(emb, 4, train_fraction=0.000001)
    with pytest.raises(ValueError, match="in \\(0, 1\\]"):
        similarity.ivf_centroids(emb, 4, train_fraction=1.5)


def test_corpus_curation_composition(spark):
    """Quality filter runs BEFORE dedup (low-quality docs can neither be
    canonical nor suppress a good doc), and near-dups among survivors
    collapse to one canonical."""
    from data_hub_ejp_xml_pipeline_spark.queries import q_corpus_curation

    out = q_corpus_curation(spark, "/root/testdata/sf0.001").toPandas()
    assert (out.groupby("cluster_id")["is_canonical"].sum() == 1).all()
    assert out["is_canonical"].sum() <= len(out)
    # every surviving doc meets the quality bar (n_words >= 20)
    assert (out["n_words"] >= 20).all()
