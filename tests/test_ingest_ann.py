"""Continuous ANN ingest (streaming/ingest_ann.py): the IVF index's
streaming twin of the dedup ingest loop. The load-bearing properties:
the streamed index equals the sequential ivf_index_append runs, query
answers over the delta-grown index equal the inline path on the
unioned corpus, and compaction/replay keep reader results identical."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.similarity import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_read,
    ivf_index_write,
    ivf_topk,
    ivf_topk_indexed,
)
from pandarallel_spark.streaming import (
    compact_ivf_deltas,
    read_ivf_deltas,
    stream_ingest_ann,
)

_DIM, _NCENT = 8, 8


def _vecs(spark, ids, rng):
    return spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=_DIM)]) for i in ids],
        "vec_id long, embedding array<double>",
    )


def _setup_index(spark, tmp_path, rng):
    corpus = _vecs(spark, range(200), rng)
    root = str(tmp_path / "ivf")
    ivf_index_write(ivf_index_build(corpus, n_centroids=_NCENT), root)
    return corpus, root


def test_stream_ingest_ann_matches_sequential_appends(spark, tmp_path):
    rng = np.random.default_rng(41)
    corpus, root = _setup_index(spark, tmp_path, rng)
    waves = [list(range(1000, 1030)), list(range(2000, 2040))]
    frames = [_vecs(spark, w, rng) for w in waves]

    src = str(tmp_path / "src")
    for i, f in enumerate(frames):
        f.coalesce(1).write.parquet(src, mode="append" if i else "overwrite")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_ann(
        stream, "vec_id", "embedding",
        index_root=root, checkpoint=str(tmp_path / "chk"),
    )
    q.awaitTermination(180)

    # the streamed delta rows equal the sequential appends, row-for-row
    base = ivf_index_read(spark, root)
    want = {}
    for f in frames:
        for r in ivf_index_append(base, f).select(
            "c_id", "__cid__"
        ).collect():
            want[r["c_id"]] = r["__cid__"]
    got = {
        r["c_id"]: r["__cid__"]
        for r in read_ivf_deltas(spark, root).collect()
    }
    assert got == want

    # queries over the delta-grown index == inline path on the union
    queries = _vecs(spark, range(5000, 5004), rng)
    grown = ivf_index_read(spark, root, include_deltas=True)
    a = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["score"])
        for r in ivf_topk_indexed(queries, grown, k=3, nprobe=_NCENT).collect()
    )
    union = corpus
    for f in frames:
        union = union.unionByName(f)
    b = sorted(
        (r["q_id"], r["rank"], r["c_id"], r["score"])
        for r in ivf_topk(
            queries, union, k=3, n_centroids=_NCENT, nprobe=_NCENT
        ).collect()
    )
    assert a == b

    # restart over the same checkpoint with no new input: a no-op
    import os

    before = sorted(os.listdir(f"{root}/delta"))
    q2 = stream_ingest_ann(
        stream, "vec_id", "embedding",
        index_root=root, checkpoint=str(tmp_path / "chk"),
    )
    q2.awaitTermination(120)
    assert sorted(os.listdir(f"{root}/delta")) == before


def test_compact_ivf_deltas_preserves_reader_and_layout(spark, tmp_path):
    rng = np.random.default_rng(43)
    _, root = _setup_index(spark, tmp_path, rng)
    base = ivf_index_read(spark, root)
    # three delta batches written the way the loop writes them
    for b, ids in enumerate([range(1000, 1020), range(2000, 2020),
                             range(3000, 3020)]):
        ivf_index_append(base, _vecs(spark, ids, rng)).select(
            "c_id", "__cvec__", "__cid__"
        ).write.mode("overwrite").partitionBy("__cid__").parquet(
            f"{root}/delta/b={b}"
        )

    before = sorted(
        (r["c_id"], r["__cid__"])
        for r in read_ivf_deltas(spark, root).collect()
    )
    target = compact_ivf_deltas(spark, root)
    assert target == 1  # dirs 0 and 1 folded into b=1; b=2 untouched
    import os

    assert sorted(os.listdir(f"{root}/delta")) == ["b=1", "b=2"]
    # partition layout preserved inside the folded dir
    assert any(
        n.startswith("__cid__=") for n in os.listdir(f"{root}/delta/b=1")
    )
    after = sorted(
        (r["c_id"], r["__cid__"])
        for r in read_ivf_deltas(spark, root).collect()
    )
    assert after == before


def test_stale_checkpoint_and_missing_index_are_refused(spark, tmp_path):
    rng = np.random.default_rng(47)
    _, root = _setup_index(spark, tmp_path, rng)
    base = ivf_index_read(spark, root)
    # a leftover delta from batch 7 + a FRESH checkpoint → batch 0 must
    # refuse instead of silently interleaving with old outputs
    ivf_index_append(base, _vecs(spark, range(100, 110), rng)).select(
        "c_id", "__cvec__", "__cid__"
    ).write.partitionBy("__cid__").parquet(f"{root}/delta/b=7")

    src = str(tmp_path / "src2")
    _vecs(spark, range(9000, 9005), rng).write.parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(src)
    )
    q = stream_ingest_ann(
        stream, "vec_id", "embedding",
        index_root=root, checkpoint=str(tmp_path / "chk2"),
    )
    with pytest.raises(Exception, match="LATER batches"):
        q.awaitTermination(120)
        raise RuntimeError(str(q.exception()))


def test_drift_monitor_hook_flips_on_a_drifting_stream(spark, tmp_path):
    """The r12 in-loop drift hook: a stream drawn from the trained
    distribution keeps rebuild_recommended False; a drifted stream
    (vectors far from every centroid, coding poorly against the
    codebooks) flips it True on BOTH loop families, with the verdict
    carrying the triggering batch_id. Codes-only PQ indexes refuse the
    hook loudly at loop start."""
    import warnings

    from pandarallel_spark.operators.similarity import (
        ivf_list_stats,
        pq_index_build,
        pq_index_write,
        pq_list_stats,
        pq_index_read,
    )
    from pandarallel_spark.streaming import stream_ingest_pq

    rng = np.random.default_rng(71)

    def tight(spark, ids, center):
        return spark.createDataFrame(
            [
                (i, [float(x) for x in rng.normal(scale=0.1, size=_DIM) + center])
                for i in ids
            ],
            "vec_id long, embedding array<double>",
        )

    def run(loop, root, chk, src_frames, src_dir, baseline, every=1):
        for i, f in enumerate(src_frames):
            f.coalesce(1).write.parquet(
                src_dir, mode="append" if i else "overwrite"
            )
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        verdicts = []
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # drift_check warns by design
            q = loop(
                stream, "vec_id", "embedding",
                index_root=root, checkpoint=chk,
                drift_check_every=every, drift_baseline=baseline,
                on_drift=verdicts.append, drift_max_imbalance=100.0,
            )
            q.awaitTermination(180)
        return verdicts

    # --- IVF loop: in-distribution stream stays clean ------------------
    base = tight(spark, range(120), 1.0)
    root_a = str(tmp_path / "ivf_clean")
    ivf_index_write(ivf_index_build(base, n_centroids=4), root_a)
    bl_a = ivf_list_stats(ivf_index_read(spark, root_a))
    v_clean = run(
        stream_ingest_ann, root_a, str(tmp_path / "chk_a"),
        [tight(spark, range(1000, 1040), 1.0)], str(tmp_path / "src_a"), bl_a,
    )
    assert len(v_clean) == 1 and not v_clean[0]["rebuild_recommended"]
    assert "batch_id" in v_clean[0]

    # --- IVF loop: drifted stream flips the verdict --------------------
    root_b = str(tmp_path / "ivf_drift")
    ivf_index_write(ivf_index_build(base, n_centroids=4), root_b)
    bl_b = ivf_list_stats(ivf_index_read(spark, root_b))
    v_drift = run(
        stream_ingest_ann, root_b, str(tmp_path / "chk_b"),
        [
            tight(spark, range(1000, 1060), -4.0),
            tight(spark, range(2000, 2060), -4.0),
        ],
        str(tmp_path / "src_b"), bl_b,
    )
    assert len(v_drift) == 2
    assert v_drift[-1]["rebuild_recommended"]
    assert v_drift[-1]["distortion_ratio"] > 2.0

    # --- PQ loop: reconstruction error catches codebook staleness ------
    root_c = str(tmp_path / "pq_drift")
    pl, pm = pq_index_build(base, n_centroids=4, m=4, n_codes=8)
    pq_index_write(pl, pm, root_c)
    rl, rm = pq_index_read(spark, root_c)
    bl_c = pq_list_stats(rl, rm)
    v_pq = run(
        stream_ingest_pq, root_c, str(tmp_path / "chk_c"),
        [tight(spark, range(1000, 1060), -4.0)], str(tmp_path / "src_c"), bl_c,
    )
    assert len(v_pq) == 1 and v_pq[0]["rebuild_recommended"]

    # --- codes-only PQ: loud refusal at loop start ----------------------
    root_d = str(tmp_path / "pq_novec")
    nl, nm = pq_index_build(
        base, n_centroids=4, m=4, n_codes=8, store_vectors=False
    )
    pq_index_write(nl, nm, root_d)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src_c"))
    )
    with pytest.raises(ValueError, match="store_vectors=True"):
        stream_ingest_pq(
            stream, "vec_id", "embedding",
            index_root=root_d, checkpoint=str(tmp_path / "chk_d"),
            drift_check_every=1,
        )


def test_drift_monitor_failure_never_kills_ingest(spark, tmp_path):
    """Review-finding pin (r12): a raising on_drift callback (metrics
    sink down) warns and lets the batch commit — observation must not
    crash-loop the data path."""
    rng = np.random.default_rng(83)
    base = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=_DIM)]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "ivf_mon")
    ivf_index_write(ivf_index_build(base, n_centroids=4), root)
    src = str(tmp_path / "src_mon")
    spark.createDataFrame(
        [(1000 + i, [float(x) for x in rng.normal(size=_DIM)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).write.parquet(src)

    def boom(verdict):
        raise RuntimeError("metrics sink down")

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(src)
    )
    import warnings as _w

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        q = stream_ingest_ann(
            stream, "vec_id", "embedding",
            index_root=root, checkpoint=str(tmp_path / "chk_mon"),
            drift_check_every=1, on_drift=boom, drift_max_imbalance=100.0,
        )
        q.awaitTermination(120)
    assert any("drift monitor failed" in str(w.message) for w in caught)
    # the batch committed despite the failing monitor
    assert ivf_index_read(spark, root, include_deltas=True).count() == 80
