"""Persistable IVF-PQ index (round 11) — the compression twin of the
Flat index: `pq_index_build` encodes the corpus once (coarse assign +
per-subspace codes, one Arrow pass), persists lists partitioned by
`__cid__` with a one-row metadata sidecar (quantized centroid matrix +
flattened codebooks as exact int64 — nothing re-derived on reload),
and `pq_topk_indexed` answers ivf_pq_topk's exact results from the
persisted artifact with the probed-list ids pushed as a literal
partition filter.

Load-bearing invariants:
- indexed == inline row-for-row through a parquet round-trip (true-
  vector layout, exact rerank), for anchors AND kmeans codebooks;
- partition pruning: the lists scan carries the probed-cid IN filter;
- `store_vectors=False` is the 32×-compression layout: no `__cvec__`
  column, ranking is pure ADC — pinned against a numpy replay of the
  same int64 lookup tables;
- validation and strictLazy gates.

Reference frame: Jegou et al. TPAMI'11; faiss IVFPQ (+refine);
the reference repo (pandarallel) has no ANN surface.
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.similarity import (
    _np_quant,
    ivf_pq_topk,
    pq_index_build,
    pq_index_read,
    pq_index_write,
    pq_topk_indexed,
)


def _fixtures(spark, seed=29, dim=16, n_corpus=240, n_q=5):
    rng = np.random.default_rng(seed)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_corpus)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(900 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(n_q)],
        "vec_id long, embedding array<double>",
    )
    return corpus, queries


@pytest.mark.parametrize("train", ["anchors", "kmeans"])
def test_pq_indexed_equals_inline_through_parquet(spark, tmp_path, train):
    corpus, queries = _fixtures(spark)
    kw = dict(n_centroids=8, m=4, n_codes=8, nprobe=3, k=4, rerank=16)
    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_pq_topk(
            queries, corpus, train=train, seed=3,
            **{k: v for k, v in kw.items()},
        ).collect()
    )
    lists, meta = pq_index_build(
        corpus, n_centroids=8, m=4, n_codes=8, train=train, seed=3
    )
    pth = str(tmp_path / f"pq_{train}")
    pq_index_write(lists, meta, pth)
    rl, rm = pq_index_read(spark, pth)
    got_df = pq_topk_indexed(queries, rl, rm, k=4, nprobe=3, rerank=16)
    got = sorted((r.q_id, r.rank, r.c_id, r.score) for r in got_df.collect())
    assert got == inline

    # the probed-lists read statically prunes the partitioned layout
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "__cid__" in pf.group(1) and " IN " in pf.group(1), plan[:1500]


def test_pq_store_vectors_false_is_adc_ranking(spark, tmp_path):
    corpus, queries = _fixtures(spark, seed=31)
    lists, meta = pq_index_build(
        corpus, n_centroids=8, m=4, n_codes=8, store_vectors=False
    )
    assert "__cvec__" not in lists.columns  # the 32x-compression layout
    pth = str(tmp_path / "pq_novec")
    pq_index_write(lists, meta, pth)
    rl, rm = pq_index_read(spark, pth)
    got = pq_topk_indexed(queries, rl, rm, k=4, nprobe=8).collect()

    # numpy replay of the exact int64 ADC: coarse assign, codes, and
    # per-query lookup tables recomputed from the raw corpus
    crows = corpus.collect()
    ids = np.array([r["vec_id"] for r in crows], dtype="int64")
    mat = _np_quant(np.stack([np.array(list(r["embedding"])) for r in crows]))
    c_mat = mat[np.argsort(ids)][:8]
    m, sub = 4, 4
    idx = np.argmax(mat @ c_mat.T, axis=1)
    resid = mat - c_mat[idx]
    a_mat = mat[np.argsort(ids)][:8]
    a_res = a_mat - c_mat[np.argmax(a_mat @ c_mat.T, axis=1)]
    cb = a_res.reshape(8, m, sub).transpose(1, 0, 2)
    rs = resid.reshape(len(mat), m, sub)
    d = ((rs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(-1)
    codes = d.argmin(axis=2)

    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["c_id"], r["score"]))
    for qr in queries.collect():
        qv = _np_quant(np.array([list(qr["embedding"])]))[0]
        qtab = np.einsum("js,jcs->jc", qv.reshape(m, sub), cb)
        qcent = qv @ c_mat.T
        adc = qcent[idx] + qtab[np.arange(m)[:, None], codes.T].sum(axis=0)
        order = np.lexsort((ids, -adc))[:4]
        want = [
            (rk + 1, int(ids[i]), int(adc[i])) for rk, i in enumerate(order)
        ]
        assert sorted(by_q[qr["vec_id"]]) == want


def test_pq_index_validation_and_gates(spark):
    corpus, queries = _fixtures(spark, n_corpus=40)
    lists, meta = pq_index_build(corpus, n_centroids=4, m=4, n_codes=4)
    with pytest.raises(ValueError, match="not a PQ index metadata"):
        pq_topk_indexed(queries, lists, corpus)
    with pytest.raises(ValueError, match="not a PQ index lists"):
        pq_topk_indexed(queries, corpus, meta)
    with pytest.raises(ValueError, match="not divisible"):
        pq_index_build(corpus, m=5, dim=16)
    with pytest.raises(ValueError, match="train must be"):
        pq_index_build(corpus, train="zzz")
    with pytest.raises(ValueError, match="not a PQ metadata"):
        pq_index_write(lists, corpus, "/tmp/never")
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="pq_index_build"):
            pq_index_build(corpus)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_pq_index_append_equals_build_over_union(spark, tmp_path):
    """append(lists, meta, new) must encode new vectors with the
    index's OWN stored centroids and codebooks: lists ∪ appended is
    row-for-row what a rebuild over the unioned corpus produces when
    the training rule agrees (new ids all above the old head), and the
    indexed query over the appended parquet layout equals the inline
    operator on the unioned corpus."""
    from pandarallel_spark.operators.similarity import pq_index_append

    corpus, queries = _fixtures(spark)
    rng = np.random.default_rng(41)
    new = spark.createDataFrame(
        [(2000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    lists, meta = pq_index_build(corpus, n_centroids=8, m=4, n_codes=8)
    appended = pq_index_append(lists, meta, new)

    def rows(df):
        return sorted(
            (r["c_id"], r["__cid__"], tuple(r["__codes__"]))
            for r in df.collect()
        )

    rebuilt_lists, _ = pq_index_build(
        corpus.unionByName(new), n_centroids=8, m=4, n_codes=8
    )
    assert rows(lists.unionByName(appended)) == rows(rebuilt_lists)

    # persisted append: new files land in the partitioned layout and
    # the indexed query equals the inline op on the union
    pth = str(tmp_path / "pq_app")
    pq_index_write(lists, meta, pth)
    pq_index_append(
        spark.read.parquet(f"{pth}/lists"),
        spark.read.parquet(f"{pth}/meta"),
        new,
    ).write.mode("append").partitionBy("__cid__").parquet(f"{pth}/lists")
    rl, rm = pq_index_read(spark, pth)
    got = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in pq_topk_indexed(queries, rl, rm, k=4, nprobe=3, rerank=16).collect()
    )
    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_pq_topk(
            queries, corpus.unionByName(new),
            n_centroids=8, m=4, n_codes=8, k=4, nprobe=3, rerank=16,
        ).collect()
    )
    assert got == inline

    # strictLazy gate + lists-schema guard
    with pytest.raises(ValueError, match="not a PQ index lists"):
        pq_index_append(corpus, meta, new)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="pq_index_append"):
            pq_index_append(lists, meta, new)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_stream_ingest_pq_matches_sequential_appends(spark, tmp_path):
    """The PQ streaming loop: streamed delta rows equal sequential
    pq_index_append runs row-for-row, queries over the delta-grown
    index equal the inline operator on the unioned corpus, and
    compaction keeps reader results identical."""
    from pandarallel_spark.operators.similarity import pq_index_append
    from pandarallel_spark.streaming import (
        compact_pq_deltas,
        read_pq_deltas,
        stream_ingest_pq,
    )

    rng = np.random.default_rng(47)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "pq_root")
    lists, meta = pq_index_build(corpus, n_centroids=8, m=4, n_codes=8)
    pq_index_write(lists, meta, root)

    waves = [
        [(1000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(30)],
        [(2000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(40)],
        [(3000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(20)],
    ]
    frames = [
        spark.createDataFrame(w, "vec_id long, embedding array<double>")
        for w in waves
    ]
    src = str(tmp_path / "src")
    for i, f in enumerate(frames):
        f.coalesce(1).write.parquet(src, mode="append" if i else "overwrite")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_pq(
        stream, "vec_id", "embedding",
        index_root=root, checkpoint=str(tmp_path / "chk"),
    )
    q.awaitTermination(180)

    # streamed deltas == sequential appends, row-for-row
    rl, rm = pq_index_read(spark, root)
    want = {}
    for f in frames:
        for r in pq_index_append(rl, rm, f).collect():
            want[r["c_id"]] = (r["__cid__"], tuple(r["__codes__"]))
    got = {
        r["c_id"]: (r["__cid__"], tuple(r["__codes__"]))
        for r in read_pq_deltas(spark, root, rl.columns).collect()
    }
    assert got == want

    # queries over the grown index == inline on the union (anchors
    # rule agrees: delta ids sit above the base head)
    queries = spark.createDataFrame(
        [(9000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    gl, gm = pq_index_read(spark, root, include_deltas=True)
    a = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in pq_topk_indexed(queries, gl, gm, k=4, nprobe=3).collect()
    )
    union = corpus
    for f in frames:
        union = union.unionByName(f)
    b = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_pq_topk(
            queries, union, n_centroids=8, m=4, n_codes=8, k=4, nprobe=3
        ).collect()
    )
    assert a == b

    # compaction ACTUALLY folds (3 committed dirs → the two below the
    # max merge into b=1, the newest stays); readers are row-identical
    before = got
    target = compact_pq_deltas(spark, root)
    assert target == 1
    from pandarallel_spark.streaming.ingest import _committed_batches

    assert _committed_batches(spark, f"{root}/delta", "b=") == [1, 2]
    after = {
        r["c_id"]: (r["__cid__"], tuple(r["__codes__"]))
        for r in read_pq_deltas(spark, root, rl.columns).collect()
    }
    assert after == before


def test_append_rejects_mismatched_vector_width(spark):
    """A delta embedded at the wrong width must fail at build time
    naming both dims, not as an executor-side numpy shape error (and,
    in the streaming loops, a poison-pill replay)."""
    from pandarallel_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_append,
        pq_index_append,
    )

    corpus, _ = _fixtures(spark, n_corpus=40)
    wrong = spark.createDataFrame(
        [(5000, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    lists, meta = pq_index_build(corpus, n_centroids=4, m=4, n_codes=4)
    with pytest.raises(ValueError, match="16-wide.*8-wide"):
        pq_index_append(lists, meta, wrong)
    flat = ivf_index_build(corpus, n_centroids=4)
    with pytest.raises(ValueError, match="16-wide.*8-wide"):
        ivf_index_append(flat, wrong)


def test_pq_list_stats_numpy_differential_and_drift(spark):
    """pq_list_stats measures the PQ RECONSTRUCTION error per list —
    pinned against a numpy recompute — in the same (__cid__,
    n_vectors, mean_sq_dist) contract ivf_drift_check consumes, so
    appending drifted vectors (which code poorly against the trained
    codebooks) drives the distortion ratio up and the existing drift
    check recommends a rebuild."""
    from pandarallel_spark.operators.similarity import (
        ivf_drift_check,
        pq_index_append,
        pq_list_stats,
    )

    rng = np.random.default_rng(53)
    # base corpus: tight cluster — codes reconstruct it well
    corpus = spark.createDataFrame(
        [
            (i, [float(x) for x in (rng.normal(scale=0.1, size=16) + 1.0)])
            for i in range(120)
        ],
        "vec_id long, embedding array<double>",
    )
    lists, meta = pq_index_build(corpus, n_centroids=4, m=4, n_codes=8)
    base_stats = pq_list_stats(lists, meta)

    # numpy differential: recompute reconstruction error from scratch
    from pandarallel_spark.operators.similarity import _pq_index_meta

    (dim, m, n_codes, by_res, _vt, cent_ids, c_mat, cb) = _pq_index_meta(
        meta, "test"
    )
    rows = lists.collect()
    want_cnt: dict = {}
    want_err: dict = {}
    for r in rows:
        v = _np_quant(np.array([list(r["__cvec__"])]))[0]
        codes = np.array(list(r["__codes__"]), dtype="int64")
        recon = cb[np.arange(m), codes, :].reshape(dim)
        if by_res:
            slot = int(np.where(cent_ids == r["__cid__"])[0][0])
            recon = recon + c_mat[slot]
        e = int(((v - recon) ** 2).sum())
        want_cnt[r["__cid__"]] = want_cnt.get(r["__cid__"], 0) + 1
        want_err[r["__cid__"]] = want_err.get(r["__cid__"], 0) + e
    got = {r["__cid__"]: r for r in base_stats.collect()}
    for cid in set(want_cnt) | set(got):
        assert got[cid]["n_vectors"] == want_cnt.get(cid, 0)
        if want_cnt.get(cid, 0):
            assert got[cid]["mean_sq_dist"] == pytest.approx(
                want_err[cid] / want_cnt[cid]
            )

    # drifted appends code poorly: far cluster, same lists schema
    drifted = spark.createDataFrame(
        [
            (5000 + i, [float(x) for x in (rng.normal(scale=0.1, size=16) - 4.0)])
            for i in range(120)
        ],
        "vec_id long, embedding array<double>",
    )
    grown = lists.unionByName(pq_index_append(lists, meta, drifted))
    with pytest.warns(UserWarning, match="rebuild"):
        verdict = ivf_drift_check(
            pq_list_stats(grown, meta), baseline=base_stats
        )
    assert verdict["rebuild_recommended"]
    assert verdict["distortion_ratio"] > 2.0

    # codes-only index: loud refusal, not a silent wrong answer
    nv_lists, nv_meta = pq_index_build(
        corpus, n_centroids=4, m=4, n_codes=8, store_vectors=False
    )
    with pytest.raises(ValueError, match="store_vectors=True"):
        pq_list_stats(nv_lists, nv_meta)


def test_pq_index_rebuild_clears_drift_and_matches_inline(spark, tmp_path):
    """The lifecycle the r11 monitoring opened, closed: a drifted-append
    index whose pq_list_stats/ivf_drift_check verdict recommends a
    rebuild gets one — codebooks (and coarse anchors) retrained from the
    index's OWN stored vectors, never the raw corpus. Assertions:
    reconstruction error drops on the drifted index, the drift verdict
    clears against a re-snapshot baseline, geometry dials default to
    the old metadata, and the rebuilt index persisted through parquet
    answers queries row-for-row like the inline operator over the same
    vectors with the same training rule."""
    from pandarallel_spark.operators.similarity import (
        ivf_drift_check,
        pq_index_append,
        pq_index_rebuild,
        pq_list_stats,
    )

    rng = np.random.default_rng(61)
    base = spark.createDataFrame(
        [
            (i, [float(x) for x in (rng.normal(scale=0.1, size=16) + 1.0)])
            for i in range(120)
        ],
        "vec_id long, embedding array<double>",
    )
    lists, meta = pq_index_build(base, n_centroids=4, m=4, n_codes=8)
    base_stats = pq_list_stats(lists, meta)

    drifted = spark.createDataFrame(
        [
            (5000 + i, [float(x) for x in (rng.normal(scale=0.1, size=16) - 4.0)])
            for i in range(120)
        ],
        "vec_id long, embedding array<double>",
    )
    grown = lists.unionByName(pq_index_append(lists, meta, drifted))

    def mean_err(stats):
        rows = stats.collect()
        n = sum(r["n_vectors"] for r in rows)
        return (
            sum((r["mean_sq_dist"] or 0.0) * r["n_vectors"] for r in rows) / n
        )

    with pytest.warns(UserWarning, match="rebuild"):
        verdict = ivf_drift_check(
            pq_list_stats(grown, meta), baseline=base_stats,
            max_imbalance=100.0,  # this test targets CODEBOOK staleness
        )
    assert verdict["rebuild_recommended"]
    drifted_err = mean_err(pq_list_stats(grown, meta))

    new_lists, new_meta = pq_index_rebuild(grown, meta, seed=7)
    # geometry dials default to the old metadata
    nm = new_meta.collect()[0]
    assert (nm["__pq_m__"], nm["__pq_ncodes__"]) == (4, 8)
    assert len(nm["__pq_cids__"]) == 4

    # reconstruction error drops on the drifted index...
    new_stats = pq_list_stats(new_lists, new_meta)
    rebuilt_err = mean_err(new_stats)
    assert rebuilt_err < 0.5 * drifted_err
    # ...and the verdict clears against the re-snapshot baseline
    verdict2 = ivf_drift_check(
        new_stats, baseline=new_stats, max_imbalance=100.0
    )
    assert not verdict2["rebuild_recommended"]

    # rebuilt-and-persisted == inline over the same vectors, same rule
    pth = str(tmp_path / "pq_rebuilt")
    pq_index_write(new_lists, new_meta, pth)
    rl, rm = pq_index_read(spark, pth)
    queries = spark.createDataFrame(
        [(9000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    got = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in pq_topk_indexed(queries, rl, rm, k=4, nprobe=2, rerank=16).collect()
    )
    inline = sorted(
        (r.q_id, r.rank, r.c_id, r.score)
        for r in ivf_pq_topk(
            queries, base.unionByName(drifted),
            n_centroids=4, m=4, n_codes=8, k=4, nprobe=2, rerank=16,
            train="kmeans", seed=7,
        ).collect()
    )
    assert got == inline


def test_pq_index_rebuild_validation_and_gates(spark):
    """Codes-only refuses loudly (nothing to retrain from), non-index
    frames are named, and strictLazy blocks the eager build."""
    from pandarallel_spark.operators.similarity import pq_index_rebuild

    corpus, _ = _fixtures(spark, n_corpus=40)
    lists, meta = pq_index_build(corpus, n_centroids=4, m=4, n_codes=4)
    nv_lists, nv_meta = pq_index_build(
        corpus, n_centroids=4, m=4, n_codes=4, store_vectors=False
    )
    with pytest.raises(ValueError, match="store_vectors=True"):
        pq_index_rebuild(nv_lists, nv_meta)
    with pytest.raises(ValueError, match="not a PQ index lists"):
        pq_index_rebuild(corpus, meta)
    with pytest.raises(ValueError, match="not a PQ index metadata"):
        pq_index_rebuild(lists, corpus)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="pq_index_rebuild"):
            pq_index_rebuild(lists, meta)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
