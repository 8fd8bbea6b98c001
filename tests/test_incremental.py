"""Incremental near-dedup against the persistable MinHash index.

The load-bearing property is DIFFERENTIAL: an ingest cycle over a
corpus split (index OLD, delta NEW) must make the same per-new-doc
decisions as the batch pipeline over OLD ∪ NEW — same exact-dup hits,
same near-dup hits at identical Jaccard, same survivors among the
fresh docs — while touching the old corpus only through the index (and
candidate exemplars in exact mode)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.dedup import minhash_lsh_pairs
from pandarallel_spark.operators.incremental import (
    incremental_dedup_corpus,
    minhash_index_build,
    minhash_index_merge,
    minhash_pairs_incremental,
)

_KW = dict(n=2, num_perm=16)
_BANDS = 8


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "text"])
    ).select(F.col("id").cast("long"), "text")


@pytest.fixture()
def corpus(spark):
    """OLD: 0-4 (0≡1 exact dups, 2 near 0, 3/4 unique).
    NEW: 10-15 (10 exact-dups old 0; 11 near old 3; 12≡13 exact dups of
    each other, fresh; 14 near 12; 15 unique; 16 too short to shingle)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    old = _mk(spark, [
        (0, base),
        (1, base),
        (2, base + " tail"),
        (3, "spark catalyst optimizer rewrites logical plans into physical ones"),
        (4, "entirely different content about watermarks and state stores"),
    ])
    new = _mk(spark, [
        (10, base),
        (11, "spark catalyst optimizer rewrites logical plans into physical form"),
        (12, "fresh document on arrow batches and pandas udf evaluation modes"),
        (13, "fresh document on arrow batches and pandas udf evaluation modes"),
        (14, "fresh document on arrow batches and pandas udf evaluation speed"),
        (15, "nothing like anything else in either corpus at all honestly"),
        (16, "short"),
    ])
    return old, new


def test_index_build_shape_and_merge_equals_whole(spark, corpus):
    old, new = corpus
    ia = minhash_index_build(old, "id", "text", **_KW)
    ib = minhash_index_build(new, "id", "text", **_KW)
    whole = minhash_index_build(old.unionByName(new), "id", "text", **_KW)

    rows = {r["__fp__"]: r for r in ia.collect()}
    # 0 and 1 collapse to one entry with exemplar 0, two members
    assert len(rows) == 4
    dup = [r for r in rows.values() if r["__members__"] == 2]
    assert len(dup) == 1 and dup[0]["__eid__"] == 0
    assert all(len(r["__sig__"]) == _KW["num_perm"] for r in rows.values())
    assert all(
        (r["__idx_n__"], r["__idx_perm__"]) == (_KW["n"], _KW["num_perm"])
        for r in rows.values()
    )

    merged = {r["__fp__"]: r for r in minhash_index_merge(ia, ib).collect()}
    want = {r["__fp__"]: r for r in whole.collect()}
    assert set(merged) == set(want)
    for fp, r in want.items():
        m = merged[fp]
        assert (m["__sz__"], m["__eid__"], m["__members__"], list(m["__sig__"])) == (
            r["__sz__"], r["__eid__"], r["__members__"], list(r["__sig__"])
        )


def test_merge_rejects_mismatched_meta(spark, corpus):
    old, _ = corpus
    ia = minhash_index_build(old, "id", "text", n=2, num_perm=16)
    ib = minhash_index_build(old, "id", "text", n=3, num_perm=16)
    with pytest.raises(ValueError, match="metadata mismatch"):
        minhash_index_merge(ia, ib)
    with pytest.raises(ValueError, match="not a minhash signature index"):
        minhash_index_merge(ia, old)


def test_incremental_pairs_match_batch_decisions(spark, corpus, tmp_path):
    old, new = corpus
    # index round-trips through parquet like a real ingest loop
    pth = str(tmp_path / "idx")
    minhash_index_build(old, "id", "text", **_KW).write.parquet(pth)
    index = spark.read.parquet(pth)

    inc = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=_BANDS
    ).collect()

    batch = minhash_lsh_pairs(
        old.unionByName(new), "id", "text", threshold=0.3, bands=_BANDS, **_KW
    ).collect()
    old_ids = {0, 1, 2, 3, 4}
    cross = {
        (r.id_a, r.id_b): r.jaccard
        for r in batch
        if (r.id_a in old_ids) != (r.id_b in old_ids)
    }
    # per-new-doc decision equality: the set of new docs matching old
    # content is identical to the batch run's cross-pair endpoints
    batch_hit = {b for (a, b) in cross} | {a for (a, b) in cross if a not in old_ids}
    inc_old = [r for r in inc if r.src == "old"]
    assert {r.id_b for r in inc_old} == batch_hit == {10, 11}
    # incremental old-pairs are a subset of the batch cross pairs (the
    # exemplar stands for its cluster) at the SAME jaccard
    for r in inc_old:
        assert cross[(min(r.id_a, r.id_b), max(r.id_a, r.id_b))] == r.jaccard
        assert r.exact is True
    # exact-dup hit carries jaccard 1.0 through the fp join
    assert [r.jaccard for r in inc_old if r.id_b == 10] == [1.0]

    # new-new pairs equal the batch pairs restricted to new ids
    nn_batch = {
        (r.id_a, r.id_b): r.jaccard
        for r in batch
        if r.id_a not in old_ids and r.id_b not in old_ids
    }
    nn_inc = {(r.id_a, r.id_b): r.jaccard for r in inc if r.src == "new"}
    assert nn_inc == nn_batch
    assert {12, 13, 14} <= {i for p in nn_inc for i in p}


def test_incremental_estimate_mode_never_reads_old(spark, corpus):
    old, new = corpus
    index = minhash_index_build(old, "id", "text", **_KW)
    est = minhash_pairs_incremental(
        new, "id", "text", index, threshold=0.3, bands=_BANDS,
        include_new_pairs=False,
    ).collect()
    # exact-dup hit is still exact (fp join, no estimation involved)
    ten = [r for r in est if r.id_b == 10]
    assert len(ten) == 1 and ten[0].jaccard == 1.0 and ten[0].exact is True
    # the near hit (11 vs old 3) is found with an ESTIMATED jaccard
    # within the minhash standard error of the exact value
    exact = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=_BANDS,
        include_new_pairs=False,
    ).collect()
    e11 = [r for r in exact if r.id_b == 11][0]
    g11 = [r for r in est if r.id_b == 11]
    assert len(g11) == 1 and g11[0].exact is False
    assert abs(g11[0].jaccard - e11.jaccard) <= 3 * np.sqrt(
        e11.jaccard * (1 - e11.jaccard) / _KW["num_perm"]
    ) + 1e-9

    with pytest.raises(ValueError, match="old_docs"):
        minhash_pairs_incremental(
            new, "id", "text", index, verify="exact", bands=_BANDS
        )
    with pytest.raises(ValueError, match="verify"):
        minhash_pairs_incremental(
            new, "id", "text", index, verify="approx", bands=_BANDS
        )
    with pytest.raises(ValueError, match="bands"):
        minhash_pairs_incremental(new, "id", "text", index, bands=7)


def test_ingest_cycle_keeps_and_updates(spark, corpus):
    old, new = corpus
    index = minhash_index_build(old, "id", "text", **_KW)
    kept, updated = incremental_dedup_corpus(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=_BANDS
    )
    kept_ids = sorted(r.id for r in kept.collect())
    # 10 (exact old dup) and 11 (near old dup) dropped; 12/13/14 cluster
    # to one survivor (min id 12); 15 unique; 16 shingle-less passthrough
    assert kept_ids == [12, 15, 16]

    up = {r["__fp__"]: r for r in updated.collect()}
    want = {
        r["__fp__"]: r
        for r in minhash_index_merge(
            index, minhash_index_build(
                new.filter(F.col("id").isin([12, 15])), "id", "text", **_KW
            )
        ).collect()
    }
    assert set(up) == set(want)
    for fp, r in want.items():
        assert (up[fp]["__sz__"], up[fp]["__eid__"], up[fp]["__members__"]) == (
            r["__sz__"], r["__eid__"], r["__members__"]
        )

    # keep_by quality: 13 outscores 12 → 13 survives the fresh cluster
    scored = new.withColumn(
        "q", F.when(F.col("id") == 13, F.lit(9.0)).otherwise(F.lit(1.0))
    )
    kept_q, _ = incremental_dedup_corpus(
        scored, "id", "text", index, old_docs=old, threshold=0.3,
        bands=_BANDS, keep_by="q",
    )
    assert sorted(r.id for r in kept_q.collect()) == [13, 15, 16]


def test_chain_through_dropped_partner_is_dropped(spark):
    """Retained-content closure: old ≈ a, a ≈ b, but b alone is BELOW
    threshold against old. The batch pipeline's connected components
    over OLD ∪ NEW put {old, a, b} in one cluster and drop both new
    docs; the ingest cycle must do the same — b must not slip into the
    corpus through its dropped partner."""
    from pandarallel_spark.operators.incremental import (
        incremental_dedup_corpus,
        minhash_index_build,
        minhash_pairs_incremental,
    )

    old = _mk(spark, [
        (0, "spark catalyst optimizer rewrites logical plans into physical ones"),
    ])
    new = _mk(spark, [
        (10, "spark catalyst optimizer rewrites logical plans into physical form"),
        (11, "engine rewrites logical plans into physical form somehow eventually done"),
        (12, "completely unrelated prose about watermark state store cleanup"),
    ])
    index = minhash_index_build(old, "id", "text", **_KW)
    # bands = num_perm (one row per band) makes candidate generation
    # near-certain at these jaccards, so the THRESHOLD decides alone
    pairs = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.35, bands=16
    ).collect()
    # premise: 10 matches old directly; 11 does NOT (J(11, old) < 0.35)
    # but pairs with 10 (J >= 0.35)
    assert {r.id_b for r in pairs if r.src == "old"} == {10}
    assert {(r.id_a, r.id_b) for r in pairs if r.src == "new"} == {(10, 11)}

    kept, _ = incremental_dedup_corpus(
        new, "id", "text", index, old_docs=old, threshold=0.35, bands=16
    )
    assert sorted(r.id for r in kept.collect()) == [12]


def test_fp_matched_delta_doc_short_circuits_to_exact_only(spark):
    """A delta doc whose shingle set is ALREADY indexed gets exactly
    one pair — (that set's exemplar, doc, 1.0) — and no near pairs
    against OTHER index entries, even ones above threshold: the
    fingerprint join short-circuits banding (the op's exact-first
    contract, and what the graded oracle now mirrors)."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    old = _mk(spark, [(0, base), (2, base + " with a short tail")])
    new = _mk(spark, [(11, base)])  # fp-identical to 0, near 2
    index = minhash_index_build(old, "id", "text", **_KW)
    got = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=16,
        include_new_pairs=False,
    ).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == [(0, 11, 1.0)]


def test_explicit_params_and_meta_validation(spark, corpus):
    old, new = corpus
    index = minhash_index_build(old, "id", "text", **_KW)
    # explicit params matching the metadata: identical result
    a = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=_BANDS,
        **_KW,
    ).collect()
    b = minhash_pairs_incremental(
        new, "id", "text", index, old_docs=old, threshold=0.3, bands=_BANDS,
    ).collect()
    key = lambda r: (r.src, r.id_a, r.id_b)  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
    # contradicting the embedded metadata raises instead of silently
    # matching nothing
    with pytest.raises(ValueError, match="contradicts"):
        minhash_pairs_incremental(
            new, "id", "text", index, old_docs=old, n=3, num_perm=64
        )
    with pytest.raises(ValueError, match="BOTH"):
        minhash_pairs_incremental(new, "id", "text", index, n=2)
    with pytest.raises(ValueError, match="bands"):
        minhash_pairs_incremental(new, "id", "text", index, bands=-8)


def test_strict_lazy_requires_explicit_params(spark, corpus):
    old, new = corpus
    index = minhash_index_build(old, "id", "text", **_KW)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="metadata probe"):
            minhash_pairs_incremental(
                new, "id", "text", index, threshold=0.3, bands=_BANDS
            )
        # explicit params skip the probe — plan builds under strictLazy
        df = minhash_pairs_incremental(
            new, "id", "text", index, threshold=0.3, bands=_BANDS, **_KW
        )
        assert set(df.columns) == {"id_a", "id_b", "jaccard", "src", "exact"}
        # the eager clustering cycle stays forbidden, like the batch op
        with pytest.raises(RuntimeError, match="clustering"):
            incremental_dedup_corpus(
                new, "id", "text", index, threshold=0.3, bands=_BANDS, **_KW
            )
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_empty_index_degrades_to_delta_self_dedup(spark, corpus):
    _, new = corpus
    empty = minhash_index_build(new.filter(F.lit(False)), "id", "text", **_KW)
    kept, updated = incremental_dedup_corpus(
        new, "id", "text", empty, threshold=0.3, bands=_BANDS
    )
    # no old content: only the fresh 12/13/14 cluster collapses
    assert sorted(r.id for r in kept.collect()) == [10, 11, 12, 15, 16]
    # updated index ready for the NEXT cycle: built from the kept docs
    # with the batch defaults (n=3, num_perm=64 — empty index has no meta)
    up = updated.collect()
    assert all(r["__idx_n__"] == 3 and r["__idx_perm__"] == 64 for r in up)
    assert len(up) == 4  # 10, 11, 12, 15 shingle; 16 is too short

    # explicit params beat the defaults when the index has no metadata
    # rows to speak for itself — the next cycle's index carries them
    _, up2 = incremental_dedup_corpus(
        new, "id", "text", empty, threshold=0.3, bands=_BANDS, **_KW
    )
    r2 = up2.collect()
    assert all(
        (r["__idx_n__"], r["__idx_perm__"]) == (_KW["n"], _KW["num_perm"])
        for r in r2
    )


def test_stream_ingest_dedup_matches_sequential_cycles(spark, tmp_path):
    """The streaming loop must equal running incremental_dedup_corpus
    cycle-by-cycle on the driver: same retained corpus, same final
    index. A restart over the same checkpoint (no new input) must be a
    no-op — no new batch dirs, no new index versions."""
    from pandarallel_spark.operators.incremental import (
        incremental_dedup_corpus,
        minhash_index_build,
    )
    from pandarallel_spark.streaming import stream_ingest_dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    waves = [
        [(100, base + " alpha"), (101, "first wave unique doc about join reordering")],
        [(200, base + " alpha"),  # exact dup of 100 → dropped
         (201, base + " alpha beta"),  # near 100 → dropped
         (202, "second wave fresh doc about shuffle partitions")],
        [(300, "second wave fresh doc about shuffle partitions"),  # dup of 202
         (301, "third wave genuinely new content on broadcast joins")],
    ]
    src = str(tmp_path / "src")
    for i, w in enumerate(waves):
        spark.createDataFrame(w, "id long, text string").coalesce(1).write.parquet(
            src, mode="append" if i else "overwrite"
        )
        # distinct files → distinct micro-batches under maxFilesPerTrigger=1

    boot = str(tmp_path / "boot")
    spark.createDataFrame(
        [(1, base), (2, "bootstrap corpus doc concerning watermark state")],
        "id long, text string",
    ).write.parquet(boot)

    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    kw = dict(n=2, num_perm=16, threshold=0.4, bands=8)

    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_dedup(
        stream, "id", "text",
        corpus_root=corpus_root, index_root=index_root,
        checkpoint=str(tmp_path / "chk"), bootstrap_docs=boot, **kw,
    )
    q.awaitTermination(180)

    from pandarallel_spark.streaming import read_retained_corpus

    got_ids = sorted(
        r.id for r in read_retained_corpus(spark, corpus_root).collect()
    )
    # the committed-reader view equals the raw glob once everything
    # committed, and including the bootstrap adds exactly those docs
    assert got_ids == sorted(
        r.id for r in spark.read.parquet(f"{corpus_root}/ingest_batch=*").collect()
    )
    with_boot = read_retained_corpus(spark, corpus_root, bootstrap_docs=boot)
    assert sorted(r.id for r in with_boot.collect()) == sorted(got_ids + [1, 2])

    # sequential reference: same waves through the pure function, in the
    # order the stream's file source delivers them (file order = write
    # order under maxFilesPerTrigger=1 on a fresh dir)
    old = spark.read.parquet(boot)
    index = minhash_index_build(old, "id", "text", n=kw["n"], num_perm=kw["num_perm"])
    kept_all = []
    for w in waves:
        delta = spark.createDataFrame(w, "id long, text string")
        kept, index = incremental_dedup_corpus(
            delta, "id", "text", index, old_docs=old, **kw
        )
        kept = kept.persist()
        kept_all += [r.id for r in kept.collect()]
        old = old.unionByName(kept)
    assert got_ids == sorted(kept_all)
    # spot-pin the planted duplicates regardless of the reference run:
    # 200 is an exact copy of wave-1's 100, 300 of wave-2's 202 — they
    # must be gone whichever way 100 itself fared against the bootstrap
    assert 200 not in got_ids and 300 not in got_ids
    assert 301 in got_ids  # genuinely new content always survives

    # final streamed index == sequential final index, row for row
    vs = sorted(
        int(p.rsplit("=", 1)[1])
        for p in [str(x) for x in (tmp_path / "index").iterdir()]
        if "v=" in p
    )
    streamed = {
        r["__fp__"]: (r["__sz__"], r["__eid__"], r["__members__"])
        for r in spark.read.parquet(f"{index_root}/v={vs[-1]}").collect()
    }
    want = {
        r["__fp__"]: (r["__sz__"], r["__eid__"], r["__members__"])
        for r in index.collect()
    }
    assert streamed == want

    # restart over the same checkpoint: nothing new to read → no-op
    before_dirs = sorted(x.name for x in (tmp_path / "corpus").iterdir())
    q2 = stream_ingest_dedup(
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(src),
        "id", "text",
        corpus_root=corpus_root, index_root=index_root,
        checkpoint=str(tmp_path / "chk"), bootstrap_docs=boot, **kw,
    )
    q2.awaitTermination(120)
    assert sorted(x.name for x in (tmp_path / "corpus").iterdir()) == before_dirs
    assert got_ids == sorted(
        r.id for r in spark.read.parquet(f"{corpus_root}/ingest_batch=*").collect()
    )
