"""Round-10 hardening regressions: the r9 ADVICE fixes (pin-probe reuse,
candidate-broadcast tunable, simhash parameter validation) and the r9
verdict's ranked tasks (group-skew guard, MinHash bucket cap,
reliable-checkpoint opt-in, embedding-method corpus dedup, IVF recall
contract, streaming heavy-hitters emit modes)."""

import warnings

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ADVICE r9 fixes
# ---------------------------------------------------------------------------


def test_pin_small_both_paths(spark):
    """Under-cap sets come back as a driver-local re-create; over-cap
    sets fall back to a checkpoint. Both must carry the exact rows."""
    from pandarallel_spark.operators.relational import _pin_small

    src = spark.createDataFrame(
        pd.DataFrame({"k": [f"k{i}" for i in range(10)], "n": range(10)})
    ).select("k", F.col("n").cast("long").alias("n"))

    small = _pin_small(src, "k string, n long", cap=64)
    assert sorted((r.k, r.n) for r in small.collect()) == [
        (f"k{i}", i) for i in range(10)
    ]
    # driver re-create: a local-rows scan, detached from the source plan
    assert "ExistingRDD" in small._jdf.queryExecution().executedPlan().toString()

    big = _pin_small(src, "k string, n long", cap=4)
    assert sorted((r.k, r.n) for r in big.collect()) == [
        (f"k{i}", i) for i in range(10)
    ]


def test_minhash_broadcast_candidates_tunable(spark):
    """broadcast_candidates=False must be result-identical (only the
    join strategy hint changes)."""
    from pandarallel_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": list(range(6)),
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",
                    "the quick brown fox jumps over the lazy dog",
                    "completely different content about spark engines",
                    "entirely unrelated text on streaming watermarks",
                    "more unrelated prose concerning join reordering",
                ],
            }
        )
    )
    kw = dict(n=2, num_perm=16, bands=8, threshold=0.4)
    with_bc = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
    }
    without_bc = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(
            docs, "id", "text", broadcast_candidates=False, **kw
        ).collect()
    }
    assert with_bc == without_bc
    assert any(j == 1.0 for _, _, j in with_bc)  # the exact-dup pair 0-2


def test_near_dedup_corpus_simhash_rejects_jaccard_params(spark):
    from pandarallel_spark.operators.dedup import near_dedup_corpus

    docs = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "text": ["a b c", "a b c"]})
    )
    with pytest.raises(ValueError, match="threshold"):
        near_dedup_corpus(docs, "id", "text", method="simhash", threshold=0.7)
    with pytest.raises(ValueError, match="max_hamming"):
        near_dedup_corpus(docs, "id", "text", method="simhash", n=5)


# ---------------------------------------------------------------------------
# Task 3 — per-(band, hash) bucket cap in MinHash banding
# ---------------------------------------------------------------------------


def test_minhash_bucket_cap_bounds_pathological_corpus(spark):
    """30 DISTINCT near-identical docs (the post-collapse hot-band
    shape): every pair collides in nearly every band, so the uncapped
    candidate set is ~N²/2. With bucket_cap the candidate generation is
    star-shaped inside hot buckets — far fewer pairs, a subset of the
    exact ones at identical jaccard, and the transitive cluster is
    preserved."""
    from pandarallel_spark.operators.dedup import minhash_lsh_pairs
    from pandarallel_spark.operators.graph import connected_components

    n_docs = 30
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": list(range(n_docs)),
                "text": [f"{base} unique{i}" for i in range(n_docs)],
            }
        )
    )
    kw = dict(n=3, num_perm=16, bands=8, threshold=0.5)
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "id", "text", bucket_cap=2, **kw
        ).collect()
    }
    # the uncapped form finds (nearly) the full quadratic pair set
    assert len(uncapped) >= 0.9 * n_docs * (n_docs - 1) / 2
    # the cap is a real bound: star pairs ≤ bands × members ≪ quadratic
    assert len(capped) < len(uncapped)
    assert len(capped) <= 8 * n_docs  # bands × docs, the linear envelope
    # subset at identical jaccard (precision untouched)
    assert set(capped) <= set(uncapped)
    assert all(uncapped[p] == j for p, j in capped.items())
    # transitive closure intact: one cluster spanning all docs
    pairs = spark.createDataFrame(
        pd.DataFrame([(a, b) for a, b in capped], columns=["id_a", "id_b"])
    )
    cc = connected_components(pairs, "id_a", "id_b").collect()
    assert {r.node for r in cc} == set(range(n_docs))
    assert len({r.component for r in cc}) == 1

    # a generous cap is a no-op; a nonsensical one raises
    loose = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            docs, "id", "text", bucket_cap=n_docs + 1, **kw
        ).collect()
    }
    assert loose == uncapped
    with pytest.raises(ValueError, match="bucket_cap"):
        minhash_lsh_pairs(docs, "id", "text", bucket_cap=0, **kw)


# ---------------------------------------------------------------------------
# Task 6 — IVF recall contract: nprobe is the recall/cost dial
# ---------------------------------------------------------------------------


def test_ivf_recall_monotone_in_nprobe(spark):
    """Sweep nprobe ∈ {1, 2, 4, 8} against the exact top-k oracle:
    recall@k must be monotone nondecreasing, reach 1.0 at
    nprobe = n_centroids (every list probed ⇒ exhaustive search), and
    be nontrivial even at nprobe=1."""
    from pandarallel_spark.operators.similarity import _np_quant, ivf_topk

    rng = np.random.default_rng(11)
    dim, n_corpus, n_q, k, n_cent = 16, 200, 8, 5, 8
    corpus_np = rng.normal(size=(n_corpus, dim))
    queries_np = rng.normal(size=(n_q, dim))

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in corpus_np[i]]) for i in range(n_corpus)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100 + i, [float(x) for x in queries_np[i]]) for i in range(n_q)],
        "vec_id long, embedding array<double>",
    )

    # exact oracle with the SAME quantized integer scores and the same
    # tie policy (higher score, then smaller candidate id)
    cq = _np_quant(corpus_np)
    qq = _np_quant(queries_np)
    scores = qq @ cq.T  # (n_q, n_corpus)
    ids = np.arange(n_corpus)
    exact = {
        100 + qi: set(ids[np.lexsort((ids, -scores[qi]))][:k])
        for qi in range(n_q)
    }

    recalls = []
    for nprobe in (1, 2, 4, 8):
        got = ivf_topk(
            queries, corpus, k=k, n_centroids=n_cent, nprobe=nprobe
        ).collect()
        per_q = {}
        for r in got:
            per_q.setdefault(r.q_id, set()).add(r.c_id)
        rec = np.mean([
            len(per_q.get(q, set()) & exact[q]) / k for q in exact
        ])
        recalls.append(float(rec))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] == 1.0  # nprobe == n_centroids ⇒ exhaustive
    assert recalls[0] > 0.2  # a single probed list already finds some
    assert recalls[0] < 1.0  # ...but the dial is real on this data


# ---------------------------------------------------------------------------
# Task 5 — embedding-space near-dedup (SemDeDup-shaped) in near_dedup_corpus
# ---------------------------------------------------------------------------


def test_near_dedup_corpus_embedding_end_to_end(spark):
    """Fourth signal type: vectors 1/2/3 are three near-identical
    embeddings (one cluster), 4/5 are far from everything. keep_by
    picks the best-scored cluster member."""
    from pandarallel_spark.operators.dedup import near_dedup_corpus

    rng = np.random.default_rng(7)
    base = rng.normal(size=32)
    rows = []
    for i, (vec, score) in enumerate(
        [
            (base + rng.normal(scale=0.01, size=32), 1.0),
            (base + rng.normal(scale=0.01, size=32), 9.0),  # best in cluster
            (base + rng.normal(scale=0.01, size=32), 2.0),
            (rng.normal(size=32), 0.0),
            (rng.normal(size=32), 0.0),
        ],
        start=1,
    ):
        rows.append((i, [float(x) for x in vec], float(score)))
    df = spark.createDataFrame(rows, "id long, emb array<double>, quality double")

    out = near_dedup_corpus(
        df, "id", "emb", method="embedding", threshold=0.95, keep_by="quality",
        bands=8, planes_per_band=2,
    )
    kept = sorted(r.id for r in out.collect())
    assert kept == [2, 4, 5]  # best-scored member survives the cluster

    # min-id default policy without keep_by
    out2 = near_dedup_corpus(
        df, "id", "emb", method="embedding", threshold=0.95,
        bands=8, planes_per_band=2,
    )
    assert sorted(r.id for r in out2.collect()) == [1, 4, 5]

    with pytest.raises(ValueError, match="shingles"):
        near_dedup_corpus(df, "id", "emb", method="embedding", n=3)


def test_near_dedup_corpus_embedding_default_is_cosine_not_jaccard(spark):
    """An unset threshold must defer to cosine_pairs_lsh's near-dup
    default (0.8), NOT inherit the Jaccard 0.5 convention — at cosine
    0.5 merely topically-related vectors (here ~0.7 cosine) would chain
    into one cluster and rows would silently vanish."""
    from pandarallel_spark.operators.dedup import near_dedup_corpus

    # unit vectors at a controlled angle: cos(a, b) ≈ 0.71 — related,
    # not near-duplicate. Must survive the default threshold.
    a = np.zeros(8)
    a[0] = 1.0
    b = np.zeros(8)
    b[0], b[1] = 0.71, np.sqrt(1 - 0.71**2)
    df = spark.createDataFrame(
        [(1, [float(x) for x in a]), (2, [float(x) for x in b])],
        "id long, emb array<double>",
    )
    out = near_dedup_corpus(df, "id", "emb", method="embedding")
    assert sorted(r.id for r in out.collect()) == [1, 2]
    # the same pair IS collapsed once the caller opts into a loose dial
    # (single-plane bands make the LSH collision near-certain at 0.71
    # cosine, so the threshold is the only thing deciding)
    out_loose = near_dedup_corpus(
        df, "id", "emb", method="embedding", threshold=0.5,
        bands=8, planes_per_band=1,
    )
    assert sorted(r.id for r in out_loose.collect()) == [1]


# ---------------------------------------------------------------------------
# Task 4 — reliable-checkpoint opt-in for iterative / reused intermediates
# ---------------------------------------------------------------------------


def test_reliable_checkpoint_opt_in(spark, tmp_path):
    """With the conf set and a checkpoint dir configured, the
    contraction rounds write RELIABLE checkpoints (files under the dir)
    and produce the same labeling; without a dir the error is
    actionable; default stays localCheckpoint (no files)."""
    import os

    from pandarallel_spark.operators._memo import RELIABLE_CHECKPOINT_CONF
    from pandarallel_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 3, 10], "id_b": [2, 3, 4, 11]})
    )
    expected = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}

    ckdir = str(tmp_path / "ck")
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        with pytest.raises(RuntimeError, match="setCheckpointDir"):
            connected_components(edges).collect()
        spark.sparkContext.setCheckpointDir(ckdir)
        got = {
            (r.node, r.component) for r in connected_components(edges).collect()
        }
        assert got == expected
        written = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(ckdir)
            for f in fs
        ]
        assert written  # reliable checkpoints actually hit the dir
    finally:
        spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    # default path unaffected
    got = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert got == expected


def test_reliable_checkpoint_minhash_end_to_end(spark, tmp_path):
    """The minhash intermediates run under the opt-in too — results
    identical to the default path."""
    from pandarallel_spark.operators._memo import RELIABLE_CHECKPOINT_CONF
    from pandarallel_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3],
                "text": ["a b c d e f", "a b c d e g", "totally other words here"],
            }
        )
    )
    kw = dict(n=2, num_perm=16, bands=8, threshold=0.3)
    default = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
    }
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck2"))
    spark.conf.set(RELIABLE_CHECKPOINT_CONF, "true")
    try:
        reliable = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in minhash_lsh_pairs(docs, "id", "text", **kw).collect()
        }
    finally:
        spark.conf.unset(RELIABLE_CHECKPOINT_CONF)
    assert reliable == default and default


# ---------------------------------------------------------------------------
# Task 1 — group-skew guard for the grouped-UDF paths
# ---------------------------------------------------------------------------


@pytest.fixture()
def skew_conf(spark):
    """Probe at fraction 1.0 (exact) with a 50-row bound, reset after."""
    from pandarallel_spark.operators import _skew

    spark.conf.set(_skew.GROUP_SKEW_BOUND_CONF, "50")
    spark.conf.set(_skew.GROUP_SKEW_FRACTION_CONF, "1.0")
    _skew._probe_memo.clear()
    yield
    spark.conf.unset(_skew.GROUP_SKEW_BOUND_CONF)
    spark.conf.unset(_skew.GROUP_SKEW_FRACTION_CONF)
    _skew._probe_memo.clear()


def _skewed_parquet(spark, tmp_path, monster_rows=400):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * monster_rows + [f"k{i}" for i in range(20)],
            "v": np.arange(monster_rows + 20, dtype="float64"),
        }
    )
    path = str(tmp_path / "skewed.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_grouped_apply_warns_on_monster_group(spark, tmp_path, skew_conf):
    from pandarallel_spark.operators.groupby import grouped_apply

    df = _skewed_parquet(spark, tmp_path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = grouped_apply(
            df, "k", lambda g: float(g["v"].sum()),
            schema="k string, result double", mode="scalar",
        )
        rows = {r.k: r.result for r in out.collect()}
    skew_warns = [x for x in w if "WHOLE group" in str(x.message)]
    assert len(skew_warns) == 1
    assert "grouped_agg" in str(skew_warns[0].message)  # names the alternative
    # results unchanged by the probe
    exact = {
        r.k: r.s
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    }
    assert rows == exact


def test_grouped_apply_no_warning_when_balanced(spark, tmp_path, skew_conf):
    from pandarallel_spark.operators.groupby import grouped_apply

    pdf = pd.DataFrame({"k": [f"k{i % 10}" for i in range(100)], "v": range(100)})
    path = str(tmp_path / "balanced.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        grouped_apply(
            df, "k", lambda g: float(len(g)),
            schema="k string, result double", mode="scalar",
        ).collect()
    assert not [x for x in w if "WHOLE group" in str(x.message)]


def test_skew_probe_skips_under_strict_lazy(spark, tmp_path, skew_conf):
    from pandarallel_spark.operators._memo import STRICT_LAZY_CONF
    from pandarallel_spark.operators._skew import warn_on_group_skew

    df = _skewed_parquet(spark, tmp_path)
    spark.conf.set(STRICT_LAZY_CONF, "true")
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            est = warn_on_group_skew(df, ["k"], "op", "alt")
        assert est is None and not w
    finally:
        spark.conf.unset(STRICT_LAZY_CONF)


def test_grouped_window_udf_branch_warns(spark, tmp_path, skew_conf):
    from pandarallel_spark.operators.window import rolling_apply

    df = _skewed_parquet(spark, tmp_path)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = rolling_apply(
            df, "v", 3, lambda a: float(a.sum()),
            "v", partition_by=["k"], vectorize=False,
        )
        n = out.count()
    assert n == df.count()
    assert [x for x in w if "WHOLE group" in str(x.message)]


# ---------------------------------------------------------------------------
# r10: persistable IVF index — the ANN twin of the MinHash signature index
# ---------------------------------------------------------------------------


def test_ivf_indexed_matches_inline_and_prunes_partitions(spark, tmp_path):
    """ivf_topk_indexed over a parquet-persisted, __cid__-partitioned
    index must equal ivf_topk on the raw corpus row-for-row, and its
    scan must carry a dynamic partition pruning filter so only the
    probed lists are read."""
    from pandarallel_spark.operators.similarity import (
        ivf_index_build,
        ivf_topk,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(23)
    dim, n_corpus, n_q, n_cent = 8, 300, 6, 10
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_corpus)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(500 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_q)],
        "vec_id long, embedding array<double>",
    )

    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_topk(
            queries, corpus, k=4, n_centroids=n_cent, nprobe=3
        ).collect()
    )

    pth = str(tmp_path / "ivf")
    ivf_index_build(corpus, n_centroids=n_cent).write.partitionBy(
        "__cid__"
    ).parquet(pth)
    index = spark.read.parquet(pth)
    got_df = ivf_topk_indexed(queries, index, k=4, nprobe=3)
    got = sorted((r.q_id, r.rank, r.c_id, r.score) for r in got_df.collect())
    assert got == inline

    # the probed-lists read: the index scan must carry the literal
    # probed-cid set as a PARTITION filter — that's what makes the
    # persisted index read ~nprobe/n_centroids of the bytes
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "__cid__" in pf.group(1) and " IN " in pf.group(1), plan[:1500]

    # authoritative centroids: the metadata, not the surviving rows,
    # define the lists — filtering a CENTROID member out of the index
    # must leave every other answer intact (it only disappears as a
    # candidate), where a rows-based recovery would silently re-derive
    # a different centroid set and probe the wrong lists
    victim = next(c for (_, _, c, _) in inline)  # appears in results
    filt = index.filter(F.col("c_id") != victim)
    got_f = {
        (r.q_id, r.rank): r.c_id
        for r in ivf_topk_indexed(queries, filt, k=4, nprobe=3).collect()
    }
    assert victim not in got_f.values()
    untouched_qs = {
        q for (q, _, _, _) in inline
    } - {q for (q, _, c, _) in inline if c == victim}
    for (q, rk, c, _) in inline:
        if q in untouched_qs:
            assert got_f[(q, rk)] == c

    # schema guard: a non-index frame is rejected with guidance
    with pytest.raises(ValueError, match="not an IVF index"):
        ivf_topk_indexed(queries, corpus)

    # empty index: loud error, not a silent empty result
    empty = index.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        ivf_topk_indexed(queries, empty, k=4, nprobe=3)
