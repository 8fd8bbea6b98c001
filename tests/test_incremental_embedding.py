"""Incremental embedding near-dedup against the persistable LSH index.

The load-bearing property is DIFFERENTIAL, like the MinHash twin
(test_incremental.py): an ingest cycle over a corpus split (index OLD,
delta NEW) must make the same per-new-doc decisions as the batch
operator over OLD ∪ NEW — same exact-dup hits, same near-dup hits at
IDENTICAL cosine, same survivors among the fresh docs — while never
reading the old corpus at all (the index carries the vectors)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.incremental_embedding import (
    embedding_index_build,
    embedding_index_merge,
    embedding_pairs_incremental,
    incremental_dedup_embeddings,
)
from pandarallel_spark.operators.similarity import cosine_pairs_lsh

_KW = dict(planes=16, seed=5, dim=8)
_BANDS = 4  # 4 planes per band at planes=16


def _mk(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "id long, emb array<double>",
    )


@pytest.fixture()
def corpus(spark):
    """OLD: 0-4 (0≡1 exact dups, 2 near 0, 3/4 unique-ish).
    NEW: 10-14 (10 exact-dups old 0; 11 near old 0/2; 12≡13 exact dups
    of each other, fresh; 14 unique)."""
    rng = np.random.default_rng(7)
    dim = _KW["dim"]
    base = rng.standard_normal(dim)
    v12 = rng.standard_normal(dim)
    old = _mk(spark, [
        (0, base),
        (1, base),
        (2, base + 0.01 * rng.standard_normal(dim)),
        (3, rng.standard_normal(dim)),
        (4, rng.standard_normal(dim)),
    ])
    new = _mk(spark, [
        (10, base),
        (11, base + 0.012 * rng.standard_normal(dim)),
        (12, v12),
        (13, v12),
        (14, rng.standard_normal(dim)),
    ])
    return old, new


def test_index_build_shape_and_merge_equals_whole(spark, corpus):
    old, new = corpus
    ia = embedding_index_build(old, "id", "emb", **_KW)
    ib = embedding_index_build(new, "id", "emb", **_KW)
    whole = embedding_index_build(old.unionByName(new), "id", "emb", **_KW)

    rows = {r["__fp__"]: r for r in ia.collect()}
    # 0 and 1 collapse to one entry with exemplar 0, two members
    assert len(rows) == 4
    dup = [r for r in rows.values() if r["__members__"] == 2]
    assert len(dup) == 1 and dup[0]["__eid__"] == 0
    words = (_KW["planes"] + 63) // 64
    assert all(len(r["__bits__"]) == words for r in rows.values())
    assert all(len(r["__qv__"]) == _KW["dim"] for r in rows.values())
    assert all(
        (r["__idx_dim__"], r["__idx_planes__"], r["__idx_seed__"])
        == (_KW["dim"], _KW["planes"], _KW["seed"])
        for r in rows.values()
    )

    merged = {r["__fp__"]: r for r in embedding_index_merge(ia, ib).collect()}
    want = {r["__fp__"]: r for r in whole.collect()}
    assert set(merged) == set(want)
    for fp, r in want.items():
        m = merged[fp]
        assert (
            m["__eid__"], m["__members__"], list(m["__qv__"]),
            m["__n2__"], list(m["__bits__"]),
        ) == (
            r["__eid__"], r["__members__"], list(r["__qv__"]),
            r["__n2__"], list(r["__bits__"]),
        )


def test_merge_rejects_mismatched_meta(spark, corpus):
    old, _ = corpus
    ia = embedding_index_build(old, "id", "emb", planes=16, seed=5, dim=8)
    ib = embedding_index_build(old, "id", "emb", planes=16, seed=6, dim=8)
    with pytest.raises(ValueError, match="metadata mismatch"):
        embedding_index_merge(ia, ib)
    with pytest.raises(ValueError, match="not an embedding signature index"):
        embedding_index_merge(ia, old)


def test_integral_id_required(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "id string, emb array<double>"
    )
    with pytest.raises(TypeError, match="integral id"):
        embedding_index_build(df, "id", "emb", planes=8, seed=1, dim=2)


def test_incremental_pairs_match_batch_decisions(spark, corpus, tmp_path):
    old, new = corpus
    # index round-trips through parquet like a real ingest loop
    pth = str(tmp_path / "eidx")
    embedding_index_build(old, "id", "emb", **_KW).write.parquet(pth)
    index = spark.read.parquet(pth)

    inc = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.8, bands=_BANDS
    ).collect()

    batch = cosine_pairs_lsh(
        old.unionByName(new), id_col="id", vec_col="emb", threshold=0.8,
        bands=_BANDS, planes_per_band=_KW["planes"] // _BANDS,
        seed=_KW["seed"], dim=_KW["dim"],
    ).collect()
    old_ids = {0, 1, 2, 3, 4}
    cross = {
        (r.id_a, r.id_b): r.cosine
        for r in batch
        if (r.id_a in old_ids) != (r.id_b in old_ids)
    }
    # per-new-doc decision equality: the set of new docs matching old
    # content is identical to the batch run's cross-pair endpoints
    batch_hit = {b for (a, b) in cross} | {a for (a, b) in cross if a not in old_ids}
    inc_old = [r for r in inc if r.src == "old"]
    assert {r.id_b for r in inc_old} == batch_hit == {10, 11}
    # incremental old-pairs carry the SAME cosine the batch run computes
    # for the (exemplar, new) pair — bit-identical doubles, except the
    # fp short-circuit which reports the 1.0 identity
    for r in inc_old:
        key = (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        if r.cosine == 1.0:
            continue  # fp join: identical quantized vectors
        assert cross[key] == r.cosine

    # new-new pairs equal the batch pairs restricted to new ids
    nn_batch = {
        (r.id_a, r.id_b): r.cosine
        for r in batch
        if r.id_a not in old_ids and r.id_b not in old_ids
    }
    nn_inc = {(r.id_a, r.id_b): r.cosine for r in inc if r.src == "new"}
    assert nn_inc == nn_batch
    assert (12, 13) in nn_inc


def test_fp_matched_delta_doc_short_circuits_to_exact_only(spark):
    """A delta vector ALREADY indexed gets exactly one pair — (its
    entry's exemplar, doc, 1.0) — and no near pairs against OTHER index
    entries, even ones above threshold: the fingerprint join
    short-circuits banding (the exact-first contract the graded oracle
    mirrors)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    old = _mk(spark, [(0, base), (2, base + 0.005 * rng.standard_normal(8))])
    new = _mk(spark, [(11, base)])  # fp-identical to 0, near 2
    index = embedding_index_build(old, "id", "emb", **_KW)
    got = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.8, bands=_BANDS,
        include_new_pairs=False,
    ).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in got] == [(0, 11, 1.0)]


def test_ingest_cycle_keeps_and_updates(spark, corpus):
    old, new = corpus
    index = embedding_index_build(old, "id", "emb", **_KW)
    kept, updated = incremental_dedup_embeddings(
        new, "id", "emb", index, threshold=0.8, bands=_BANDS
    )
    kept_ids = sorted(r.id for r in kept.collect())
    # 10 (exact old dup) and 11 (near old dup) dropped; 12/13 cluster to
    # one survivor (min id 12); 14 unique
    assert kept_ids == [12, 14]

    up = {r["__fp__"]: r for r in updated.collect()}
    want = {
        r["__fp__"]: r
        for r in embedding_index_merge(
            index, embedding_index_build(
                new.filter(F.col("id").isin([12, 14])), "id", "emb", **_KW
            )
        ).collect()
    }
    assert set(up) == set(want)
    for fp, r in want.items():
        assert (up[fp]["__eid__"], up[fp]["__members__"]) == (
            r["__eid__"], r["__members__"]
        )

    # keep_by quality: 13 outscores 12 → 13 survives the fresh cluster
    scored = new.withColumn(
        "q", F.when(F.col("id") == 13, F.lit(9.0)).otherwise(F.lit(1.0))
    )
    kept_q, _ = incremental_dedup_embeddings(
        scored, "id", "emb", index, threshold=0.8, bands=_BANDS, keep_by="q"
    )
    assert sorted(r.id for r in kept_q.collect()) == [13, 14]


def test_chain_through_dropped_partner_is_dropped(spark):
    """Retained-content closure: old ≈ a, a ≈ b, but b alone is BELOW
    threshold against old — b must not slip into the corpus through its
    dropped partner (the batch pipeline's transitive closure)."""
    # a chain along a rotation: cos(old, a) and cos(a, b) above the
    # threshold, cos(old, b) below it
    def unit(theta):
        v = np.zeros(8)
        v[0], v[1] = np.cos(theta), np.sin(theta)
        return v

    step = np.arccos(0.93)
    old = _mk(spark, [(0, unit(0.0))])
    new = _mk(spark, [
        (10, unit(step * 1.0)),      # cos vs old = .93
        (11, unit(step * 2.0)),      # cos vs 10 = .93, vs old = .73
        (12, unit(np.pi / 2)),       # orthogonal to everything relevant
    ])
    index = embedding_index_build(old, "id", "emb", **_KW)
    # bands = planes (one plane per band) make candidate generation
    # near-certain at these cosines, so the THRESHOLD decides alone
    pairs = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.9, bands=_KW["planes"]
    ).collect()
    assert {r.id_b for r in pairs if r.src == "old"} == {10}
    assert {(r.id_a, r.id_b) for r in pairs if r.src == "new"} == {(10, 11)}

    kept, _ = incremental_dedup_embeddings(
        new, "id", "emb", index, threshold=0.9, bands=_KW["planes"]
    )
    assert sorted(r.id for r in kept.collect()) == [12]


def test_explicit_params_and_meta_validation(spark, corpus):
    old, new = corpus
    index = embedding_index_build(old, "id", "emb", **_KW)
    a = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.8, bands=_BANDS, **_KW
    ).collect()
    b = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.8, bands=_BANDS
    ).collect()
    key = lambda r: (r.src, r.id_a, r.id_b)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    with pytest.raises(ValueError, match="contradicts"):
        embedding_pairs_incremental(
            new, "id", "emb", index, planes=32, seed=5, dim=8
        )
    with pytest.raises(ValueError, match="ALL"):
        embedding_pairs_incremental(new, "id", "emb", index, planes=16)
    with pytest.raises(ValueError, match="bands"):
        embedding_pairs_incremental(new, "id", "emb", index, bands=3)
    with pytest.raises(ValueError, match="bucket_cap"):
        embedding_pairs_incremental(
            new, "id", "emb", index, bands=_BANDS, bucket_cap=0
        )


def test_strict_lazy_requires_explicit_params(spark, corpus):
    old, new = corpus
    index = embedding_index_build(old, "id", "emb", **_KW)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="metadata probe"):
            embedding_pairs_incremental(
                new, "id", "emb", index, threshold=0.8, bands=_BANDS
            )
        # explicit params skip the probe — plan builds under strictLazy
        df = embedding_pairs_incremental(
            new, "id", "emb", index, threshold=0.8, bands=_BANDS, **_KW
        )
        assert set(df.columns) == {"id_a", "id_b", "cosine", "src"}
        # the eager clustering cycle stays forbidden, like the batch op
        with pytest.raises(RuntimeError, match="clustering"):
            incremental_dedup_embeddings(
                new, "id", "emb", index, threshold=0.8, bands=_BANDS, **_KW
            )
        # merge degrades to the plan-only check + loud warning
        with pytest.warns(UserWarning, match="UNVALIDATED"):
            embedding_index_merge(index, index)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_empty_index_degrades_to_delta_self_dedup(spark, corpus):
    _, new = corpus
    empty = embedding_index_build(
        new.filter(F.lit(False)), "id", "emb", **_KW
    )
    # an empty index carries no metadata and dim has no safe default
    with pytest.raises(ValueError, match="dim has no safe default"):
        incremental_dedup_embeddings(
            new, "id", "emb", empty, threshold=0.8, bands=_BANDS
        )
    kept, updated = incremental_dedup_embeddings(
        new, "id", "emb", empty, threshold=0.8, bands=_BANDS, **_KW
    )
    # no old content: the 10/11 near pair and the 12/13 exact pair each
    # collapse to their min-id survivor
    assert sorted(r.id for r in kept.collect()) == [10, 12, 14]
    up = updated.collect()
    assert len(up) == 3
    assert all(
        (r["__idx_dim__"], r["__idx_planes__"], r["__idx_seed__"])
        == (_KW["dim"], _KW["planes"], _KW["seed"])
        for r in up
    )


def test_bucket_cap_bounds_hot_index_buckets(spark):
    """A pathological index (many distinct vectors sharing every band
    signature) must not go B_idx × B_delta: with bucket_cap=1 the
    over-cap buckets pair the delta against the hub entry only, and the
    true near-dup is still found (through the hub or another band) with
    its EXACT cosine."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(8) * 3.0
    # 40 near-identical old vectors: same sign pattern on every plane
    # (tiny perturbations at this magnitude flip nothing), all distinct
    old = _mk(spark, [
        (i, base + 1e-4 * rng.standard_normal(8)) for i in range(40)
    ])
    new = _mk(spark, [(100, base + 1e-4 * rng.standard_normal(8))])
    index = embedding_index_build(old, "id", "emb", **_KW)

    uncapped = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.99, bands=_BANDS,
        include_new_pairs=False,
    ).collect()
    capped = embedding_pairs_incremental(
        new, "id", "emb", index, threshold=0.99, bands=_BANDS,
        include_new_pairs=False, bucket_cap=1,
    ).collect()
    # uncapped: every index entry pairs with the delta; capped: only the
    # hub (min fingerprint) — candidates linear in the delta
    assert len(uncapped) == 40
    assert len(capped) == 1
    hub = capped[0]
    assert hub.id_b == 100 and hub.src == "old"
    match = [r for r in uncapped if r.id_a == hub.id_a]
    assert len(match) == 1 and match[0].cosine == hub.cosine


def test_index_survives_parquet_roundtrip_and_recycles(spark, corpus, tmp_path):
    """Two chained cycles through parquet — the real ingest shape: the
    second delta must match content retained by the FIRST cycle."""
    old, new = corpus
    p0 = str(tmp_path / "v0")
    embedding_index_build(old, "id", "emb", **_KW).write.parquet(p0)

    kept1, upd1 = incremental_dedup_embeddings(
        new, "id", "emb", spark.read.parquet(p0), threshold=0.8, bands=_BANDS
    )
    p1 = str(tmp_path / "v1")
    upd1.write.parquet(p1)
    assert sorted(r.id for r in kept1.collect()) == [12, 14]

    # second delta: 20 exact-dups 12 (retained in cycle 1), 21 fresh
    rng = np.random.default_rng(7)
    _ = rng.standard_normal(_KW["dim"])  # base
    v12 = rng.standard_normal(_KW["dim"])
    new2 = _mk(spark, [(20, v12), (21, np.ones(_KW["dim"]))])
    kept2, _ = incremental_dedup_embeddings(
        new2, "id", "emb", spark.read.parquet(p1), threshold=0.8, bands=_BANDS
    )
    assert sorted(r.id for r in kept2.collect()) == [21]


def test_stream_ingest_embedding_matches_sequential_cycles(spark, tmp_path):
    """The streaming loop with method='embedding' must equal running
    incremental_dedup_embeddings cycle-by-cycle on the driver: same
    retained corpus, same final index — and it never reads the retained
    corpus (there is no old_docs plumbing to read it with)."""
    from pandarallel_spark.streaming import (
        read_retained_corpus,
        stream_ingest_dedup,
    )

    rng = np.random.default_rng(23)
    dim = _KW["dim"]
    base = rng.standard_normal(dim)
    fresh2 = rng.standard_normal(dim)
    waves = [
        [(100, base + 0.001 * rng.standard_normal(dim)),
         (101, rng.standard_normal(dim))],
        [(200, base + 0.001 * rng.standard_normal(dim)),  # near 100 → dropped
         (202, fresh2)],
        [(300, fresh2),  # exact dup of 202 → dropped
         (301, rng.standard_normal(dim))],
    ]

    def _frame(w):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in w],
            "id long, emb array<double>",
        )

    src = str(tmp_path / "src")
    for i, w in enumerate(waves):
        _frame(w).coalesce(1).write.parquet(
            src, mode="append" if i else "overwrite"
        )

    boot = str(tmp_path / "boot")
    _frame([(1, base), (2, rng.standard_normal(dim))]).write.parquet(boot)

    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    kw = dict(threshold=0.9, bands=_BANDS)

    stream = (
        spark.readStream.schema("id long, emb array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_dedup(
        stream, "id", "emb", method="embedding",
        corpus_root=corpus_root, index_root=index_root,
        checkpoint=str(tmp_path / "chk"), bootstrap_docs=boot,
        dim=_KW["dim"], planes=_KW["planes"], seed=_KW["seed"], **kw,
    )
    q.awaitTermination(180)

    got_ids = sorted(
        r.id for r in read_retained_corpus(spark, corpus_root).collect()
    )

    # sequential reference: same waves through the pure function
    index = embedding_index_build(spark.read.parquet(boot), "id", "emb", **_KW)
    kept_all = []
    for w in waves:
        kept, index = incremental_dedup_embeddings(
            _frame(w), "id", "emb", index, **kw
        )
        kept = kept.persist()
        kept_all += [r.id for r in kept.collect()]
    assert got_ids == sorted(kept_all)
    # spot-pin the planted duplicates regardless of the reference run
    assert 200 not in got_ids and 300 not in got_ids
    assert 301 in got_ids

    # the stream's final index equals the sequential one, through the
    # committed version dir
    import re

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(index_root)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    vmax = max(
        int(st.getPath().getName().split("=")[1])
        for st in fs.listStatus(root)
        if re.match(r"v=\d+$", st.getPath().getName())
    )
    stored = spark.read.parquet(f"{index_root}/v={vmax}")
    a = {r["__fp__"]: (r["__eid__"], r["__members__"]) for r in stored.collect()}
    b = {r["__fp__"]: (r["__eid__"], r["__members__"]) for r in index.collect()}
    assert a == b


def test_stream_ingest_method_validation(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    stream = (
        spark.readStream.schema("id long, emb array<double>")
        .parquet(str(src))
    )
    common = dict(
        corpus_root=str(tmp_path / "c"), index_root=str(tmp_path / "i"),
        checkpoint=str(tmp_path / "k"),
    )
    from pandarallel_spark.streaming import stream_ingest_dedup

    with pytest.raises(ValueError, match="method must be"):
        stream_ingest_dedup(stream, "id", "emb", method="simhash", **common)
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(
            stream, "id", "emb", method="embedding", dim=8, n=3, **common
        )
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(
            stream, "id", "emb", method="embedding", dim=8, verify="exact",
            **common,
        )
    with pytest.raises(ValueError, match="requires dim"):
        stream_ingest_dedup(stream, "id", "emb", method="embedding", **common)
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(stream, "id", "emb", planes=64, **common)


def test_bucket_verify_equals_pair_verify(spark, corpus):
    """candidate_verify='buckets' must produce the SAME pair set at
    bit-identical cosines as the default 'pairs' strategy — with and
    without the hot-bucket cap (same hub semantics)."""
    old, new = corpus
    index = embedding_index_build(old, "id", "emb", **_KW)

    def run(**kw):
        return sorted(
            (r.src, r.id_a, r.id_b, r.cosine)
            for r in embedding_pairs_incremental(
                new, "id", "emb", index, threshold=0.8, bands=_BANDS, **kw
            ).collect()
        )

    assert run(candidate_verify="buckets") == run(candidate_verify="pairs")
    assert run(candidate_verify="buckets", bucket_cap=1, verify_block=2) == run(
        candidate_verify="pairs", bucket_cap=1
    )
    with pytest.raises(ValueError, match="candidate_verify"):
        embedding_pairs_incremental(
            new, "id", "emb", index, bands=_BANDS, candidate_verify="blas"
        )
