"""Hot-bucket bound for the shared Hamming verifier (r14 — the r13
verdict's #1 task): distinct-signature collapse inside each (chunk,
value) bucket, ``intra_pairs="star"`` linear expansion of
identical-signature groups, and ``bucket_cap`` star-through-hub over
distinct near signatures. Ground truth by brute force throughout."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401

from pandarallel_spark.operators.dedup import (
    _hamming_banded_pairs,
    image_hash_pairs,
    near_dedup_corpus,
    simhash_pairs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sigs)], "__id__ long, __sh__ long"
    )


def _brute(sigs, max_hamming):
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            h = bin((int(sigs[i]) ^ int(sigs[j])) & ((1 << 64) - 1)).count("1")
            if h <= max_hamming:
                out.add((i, j, h))
    return out


def _collect(df):
    return {(r["id_a"], r["id_b"], r["hamming"]) for r in df.collect()}


def test_hamming_differential_vs_bruteforce(spark):
    """Default dials (clique, no cap) stay bit-compatible with the
    pre-collapse verifier: the pair set equals brute force exactly
    (max_hamming=3 < chunks=4 → pigeonhole recall is exact), including
    duplicate and near-duplicate signatures."""
    rng = np.random.default_rng(7)
    sigs = [int(s) for s in rng.integers(-(2**63), 2**63, 40, dtype=np.int64)]
    base = sigs[0]
    sigs += [base, base ^ 1, base ^ (1 << 40), sigs[5], sigs[5]]
    got = _collect(_hamming_banded_pairs(_sig_df(spark, sigs), 3, 4, 16))
    assert got == _brute(sigs, 3)


def test_star_intra_linear_and_closure(spark):
    """An identical-signature group of 6: clique emits all 15 pairs,
    star exactly the 5 hub pairs off the min id — same transitive
    closure, linear output."""
    sigs = [123456789] * 6 + [int(0x0F0F0F0F0F0F0F0F)]
    df = _sig_df(spark, sigs)
    clique = _collect(_hamming_banded_pairs(df, 3, 4, 16))
    star = _collect(
        _hamming_banded_pairs(df, 3, 4, 16, intra_pairs="star")
    )
    assert clique == {(i, j, 0) for i in range(6) for j in range(i + 1, 6)}
    assert star == {(0, j, 0) for j in range(1, 6)}


def test_bucket_cap_bounds_candidates_linearly(spark):
    """Ten signatures that co-bucket in three chunks (single bit in
    chunk 0, zero elsewhere — pairwise Hamming 2): uncapped emits the
    full 45-pair clique; bucket_cap=2 stars every member through the
    min-signature hub — exactly N−1 pairs, candidate count linear."""
    sigs = [1 << i for i in range(10)]
    df = _sig_df(spark, sigs)
    uncapped = _collect(_hamming_banded_pairs(df, 2, 4, 16))
    assert uncapped == _brute(sigs, 2)
    assert len(uncapped) == 45
    capped = _collect(_hamming_banded_pairs(df, 2, 4, 16, bucket_cap=2))
    # hub = min unsigned signature = 1 (id 0)
    assert capped == {(0, j, 2) for j in range(1, 10)}


def test_bucket_cap_recall_through_other_chunks(spark):
    """A true pair whose members are BOTH non-hub in the over-cap
    buckets is still found through a chunk where its bucket stays
    small — the pigeonhole guarantee survives the cap."""
    sigs = [1 << i for i in range(10)] + [1 << 16, (1 << 16) | 1]
    df = _sig_df(spark, sigs)
    capped = _collect(_hamming_banded_pairs(df, 2, 4, 16, bucket_cap=2))
    # ids 10/11 share the chunk-1 value 1 in a 2-member bucket → exact
    # clique verify finds them even though chunks 2/3 are over-cap
    assert (10, 11, 1) in capped
    # precision: every emitted pair is exactly verified
    assert capped <= _brute(sigs, 2)


def test_coarse_grouping_is_group_count_invariant(spark):
    """r14 boundary-shape change: the verify stage is keyed on a coarse
    hash of the (chunk, value) bucket key, each Python call verifying
    every real bucket in its group. The pair set must not depend on the
    group count — one group holding ALL buckets, a prime count that
    splits them unevenly, and a count far above the bucket count must
    all equal brute force (and each other), with the cap/star dials
    riding along unchanged."""
    rng = np.random.default_rng(21)
    sigs = [int(s) for s in rng.integers(-(2**63), 2**63, 60, dtype=np.int64)]
    base = sigs[0]
    sigs += [base, base ^ 1, base ^ (1 << 40), sigs[5], sigs[5], sigs[5]]
    df = _sig_df(spark, sigs)
    expect = _brute(sigs, 3)
    for ng in (1, 7, 100_000):
        assert (
            _collect(_hamming_banded_pairs(df, 3, 4, 16, _num_groups=ng))
            == expect
        ), f"_num_groups={ng}"
    # dials under multi-bucket groups: star intra + cap star-through-hub
    hot = [1 << i for i in range(10)]
    hot_df = _sig_df(spark, hot)
    assert _collect(
        _hamming_banded_pairs(hot_df, 2, 4, 16, bucket_cap=2, _num_groups=1)
    ) == {(0, j, 2) for j in range(1, 10)}
    dup = _sig_df(spark, [123456789] * 6 + [int(0x0F0F0F0F0F0F0F0F)])
    assert _collect(
        _hamming_banded_pairs(dup, 3, 4, 16, intra_pairs="star", _num_groups=1)
    ) == {(0, j, 0) for j in range(1, 6)}


def test_hamming_dial_validation(spark):
    df = _sig_df(spark, [1, 2, 3])
    with pytest.raises(ValueError, match="intra_pairs"):
        _hamming_banded_pairs(df, 3, 4, 16, intra_pairs="hub")
    with pytest.raises(ValueError, match="bucket_cap"):
        _hamming_banded_pairs(df, 3, 4, 16, bucket_cap=0)


def test_simhash_pairs_star_and_cap_dials(spark):
    """The dials ride through simhash_pairs: identical texts expand
    star-linearly; defaults unchanged (clique)."""
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    rows += [(9, "completely different words entirely here now today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    clique = _collect(simhash_pairs(df, "doc_id", "text", max_hamming=0))
    star = _collect(
        simhash_pairs(df, "doc_id", "text", max_hamming=0, intra_pairs="star")
    )
    assert clique == {(i, j, 0) for i in range(5) for j in range(i + 1, 5)}
    assert star == {(0, j, 0) for j in range(1, 5)}
    # near_dedup (star default now) keeps the same survivors as before
    survivors = {
        r["doc_id"]
        for r in near_dedup_corpus(
            df, "doc_id", "text", method="simhash", max_hamming=0
        ).collect()
    }
    assert survivors == {0, 9}


def _ppm(arr):
    h, w, _ = arr.shape
    return b"P6 %d %d 255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def test_image_constant_hot_bucket_pathology(spark):
    """The verdict's pathological corpus: N solid-color images (ONE
    distinct signature — the collapse makes the hot bucket free) plus
    planted rescale near-dups, with bucket_cap and star set the way a
    100 TB image pass would run. Pairs stay exact; the constant group
    expands linearly; near_dedup keeps min-id survivors."""
    n_const = 20
    solid = np.full((64, 72, 3), 137, dtype=np.uint8)
    noise = [
        np.random.default_rng(500 + i)
        .integers(0, 256, (64, 288, 3))
        .astype(np.uint8)
        for i in range(6)
    ]
    rows = [(i, bytearray(_ppm(solid))) for i in range(n_const)]
    rows += [(100 + i, bytearray(_ppm(img))) for i, img in enumerate(noise)]
    rows += [
        (200 + i, bytearray(_ppm(np.repeat(np.repeat(noise[i], 2, 0), 2, 1))))
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = _collect(
        image_hash_pairs(
            df, "media_id", "content", max_hamming=4,
            bucket_cap=8, intra_pairs="star",
        )
    )
    # constant group: star through min id — linear, not 190 pairs
    const_pairs = {p for p in pairs if p[0] < 100}
    assert const_pairs == {(0, j, 0) for j in range(1, n_const)}
    # planted rescales still found (aligned dims → identical hashes)
    assert {(100 + i, 200 + i, 0) for i in range(3)} <= pairs
    assert not any(p[0] >= 100 and p[2] > 0 for p in pairs)
    survivors = {
        r["media_id"]
        for r in near_dedup_corpus(
            df, "media_id", "content", method="image", max_hamming=4,
            bucket_cap=8,
        ).collect()
    }
    assert survivors == {0} | {100 + i for i in range(6)}
