"""Semantic curation (operators/semantic.py): prototype scoring and
SSL-Prototypes pruning. Reference frame: Sorscher et al. 2206.14486;
the reference repo (pandarallel) has no curation surface."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.semantic import (
    _train_centers,
    prototype_scores,
    prune_prototypes,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "id long, emb array<double>",
    )


@pytest.fixture()
def two_clusters(spark):
    """Two tight, well-separated direction groups (10 docs each) plus
    one in-group outlier apiece (ids 19 and 39)."""
    rng = np.random.default_rng(5)
    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    for i in range(9):
        rows.append((i, a + 0.01 * rng.standard_normal(4)))
        rows.append((20 + i, b + 0.01 * rng.standard_normal(4)))
    rows.append((19, a + np.array([0.0, 0.4, 0.0, 0.0])))   # outlier of A
    rows.append((39, b + np.array([0.4, 0.0, 0.0, 0.0])))   # outlier of B
    return _mk(spark, rows)


def test_scores_match_numpy_with_injected_centers(spark, two_clusters):
    centers = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    got = {
        r["id"]: (r["cluster"], r["proto_cos"])
        for r in prototype_scores(
            two_clusters, "id", "emb", k=2, _centers=centers
        ).collect()
    }
    rows = two_clusters.collect()
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    for r in rows:
        v = np.array(r["emb"])
        cos = (v / np.linalg.norm(v)) @ cn.T
        assert got[r["id"]][0] == int(cos.argmax())
        # batched BLAS matmul vs per-row dot: identical math, last-ulp
        # accumulation-order differences
        assert got[r["id"]][1] == pytest.approx(float(cos.max()), rel=1e-12)


def test_zero_vector_gets_cluster_minus_one(spark):
    df = _mk(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    got = {
        r["id"]: (r["cluster"], r["proto_cos"])
        for r in prototype_scores(
            df, "id", "emb", k=1, _centers=np.array([[1.0, 0.0]])
        ).collect()
    }
    assert got[1] == (-1, 0.0)
    assert got[2] == (1 - 1, pytest.approx(1.0))


def test_kmeans_finds_the_two_groups(spark, two_clusters):
    scored = prototype_scores(two_clusters, "id", "emb", k=2, max_iter=10)
    rows = scored.collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], set()).add(r["id"])
    assert len(by_cluster) == 2
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups[0] == set(range(9)) | {19}
    assert groups[1] == {20 + i for i in range(9)} | {39}
    # outliers are the least prototypical members of their clusters
    score = {r["id"]: r["proto_cos"] for r in rows}
    assert score[19] == min(score[i] for i in groups[0])
    assert score[39] == min(score[i] for i in groups[1])


def test_prune_policies_keep_the_right_tail(spark, two_clusters):
    # policy="hard" keeps the farthest-from-prototype members: the two
    # outliers must survive a 50% prune
    hard = prune_prototypes(
        two_clusters, "id", "emb", keep_frac=0.5, policy="hard", k=2
    )
    hard_ids = {r["id"] for r in hard.collect()}
    assert {19, 39} <= hard_ids
    assert len(hard_ids) == 10  # ceil(10 * 0.5) per cluster
    assert hard.columns == ["id", "emb"]

    # policy="easy" keeps the prototypical core: outliers dropped
    easy_ids = {
        r["id"]
        for r in prune_prototypes(
            two_clusters, "id", "emb", keep_frac=0.5, policy="easy", k=2
        ).collect()
    }
    assert not {19, 39} & easy_ids
    assert len(easy_ids) == 10

    # keep_frac=1.0 is the identity; ceil never empties a cluster
    assert prune_prototypes(
        two_clusters, "id", "emb", keep_frac=1.0, k=2
    ).count() == two_clusters.count()
    assert prune_prototypes(
        two_clusters, "id", "emb", keep_frac=0.01, k=2
    ).count() == 2  # one survivor per cluster

    with pytest.raises(ValueError, match="keep_frac"):
        prune_prototypes(two_clusters, "id", "emb", keep_frac=0.0)
    with pytest.raises(ValueError, match="policy"):
        prune_prototypes(two_clusters, "id", "emb", policy="middle")


def test_training_is_deterministic(spark, two_clusters):
    a = _train_centers(two_clusters, "emb", k=2, seed=11, max_iter=10)
    b = _train_centers(two_clusters, "emb", k=2, seed=11, max_iter=10)
    assert np.array_equal(a, b)


def test_strict_lazy_gates_the_fit(spark, two_clusters):
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="k-means fit"):
            prototype_scores(two_clusters, "id", "emb", k=2)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_zero_vector_survives_the_real_fit_path(spark):
    """MLlib's cosine KMeans asserts on zero vectors — the fit must
    filter them while the scoring pass still emits them as cluster −1
    (review finding r11: the earlier test injected _centers and never
    exercised training)."""
    rng = np.random.default_rng(13)
    rows = [(i, rng.standard_normal(4)) for i in range(10)]
    rows.append((99, np.zeros(4)))
    df = _mk(spark, rows)
    got = {r["id"]: r["cluster"] for r in
           prototype_scores(df, "id", "emb", k=2, max_iter=5).collect()}
    assert got[99] == -1
    assert len(got) == 11


def test_center_persistence_roundtrip_and_validation(spark, tmp_path, two_clusters):
    """Centers persist and reload bit-for-bit, scores against reloaded
    centers equal scores against the in-memory matrix, and the loader
    validates shape/order/strictLazy (r12 — the semantic artifact joins
    the histogram/merge-table persistence family)."""
    import numpy as np

    from pandarallel_spark.operators.semantic import (
        load_prototype_centers,
        save_prototype_centers,
    )

    centers = _train_centers(two_clusters, "emb", k=2, seed=11, max_iter=10)
    pth = str(tmp_path / "centers")
    save_prototype_centers(spark, centers, pth)
    back = load_prototype_centers(spark, pth)
    assert np.array_equal(back, centers)

    a = sorted(
        map(tuple, prototype_scores(
            two_clusters, "id", "emb", k=2, _centers=centers
        ).collect())
    )
    b = sorted(
        map(tuple, prototype_scores(
            two_clusters, "id", "emb", k=2, _centers=back
        ).collect())
    )
    assert a == b

    with pytest.raises(ValueError, match="non-empty"):
        save_prototype_centers(spark, np.zeros((0, 4)), str(tmp_path / "e"))
    wrong = str(tmp_path / "wrong")
    two_clusters.select("id").write.parquet(wrong)
    with pytest.raises(ValueError, match="not a saved center"):
        load_prototype_centers(spark, wrong)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="load_prototype_centers"):
            load_prototype_centers(spark, pth)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
