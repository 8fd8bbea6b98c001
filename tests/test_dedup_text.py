"""Semantic unit tests for dedup / text / similarity / multimodal
operators on constructed inputs where ground truth is known by hand."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators import dedup, multimodal, similarity
from pandarallel_spark.operators.text import (
    fingerprint,
    language_id,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "completely different words entirely here now today"),
        (4, "dog lazy the over jumps fox brown quick the"),  # permutation of 1
        (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup_keeps_min_id(spark, docs):
    out = dedup.exact_dedup(docs, ["text"], "doc_id").toPandas()
    assert sorted(out.doc_id) == [1, 2, 3, 4]  # 5 collapsed into 1


def test_fingerprint_dedup_catches_permutation(spark, docs):
    out = dedup.fingerprint_dedup(docs, "text", "doc_id").toPandas()
    # 4 is a permutation of 1's token set, 5 an exact dup → both collapse
    assert sorted(out.doc_id) == [1, 2, 3]


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).toPandas()
    assert (1, 5) in set(zip(pairs.id_a, pairs.id_b))  # identical → j=1.0
    assert (1, 2) in set(zip(pairs.id_a, pairs.id_b))  # one word changed
    assert (1, 3) not in set(zip(pairs.id_a, pairs.id_b))


def test_minhash_lsh_agrees_with_exact(spark, docs):
    exact = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).toPandas()
    lsh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", num_perm=64, bands=16, threshold=0.5
    ).toPandas()
    assert set(zip(exact.id_a, exact.id_b)) == set(zip(lsh.id_a, lsh.id_b))


def test_simhash_identical_distance_zero(spark, docs):
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=0).toPandas()
    assert (1, 5) in set(zip(pairs.id_a, pairs.id_b))


def test_simhash_hot_bucket_clique_and_tiling(spark):
    """Skewed corpus: a large identical-text clique lands EVERY member
    in the same (chunk, value) bucket for all 4 chunks — the hot-bucket
    worst case the per-bucket tiled verify exists for. With
    verify_block=7 (forcing multi-block tiling incl. ragged edges and
    cross-block diagonal handling), the output must be exactly the
    clique's C(n,2) pairs at hamming 0, each pair once, id_a < id_b."""
    import numpy as np

    n_clique = 40
    texts = ["the exact same boilerplate text repeated everywhere"] * n_clique + [
        f"unique document number {i} with its own words entirely {i * 7}"
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"), "text": texts})
    )
    pairs = dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=0, verify_block=7
    ).toPandas()
    clique = pairs[(pairs.id_a < n_clique) & (pairs.id_b < n_clique)]
    assert len(clique) == n_clique * (n_clique - 1) // 2
    assert (clique.hamming == 0).all()
    assert (clique.id_a < clique.id_b).all()
    assert not clique.duplicated(["id_a", "id_b"]).any()


def test_simhash_rejects_non_integral_ids(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["x y z", "x y w"]})
    )
    with pytest.raises(TypeError, match="integral id"):
        dedup.simhash_pairs(docs, "doc_id", "text")


def test_token_count_and_langid(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 3],
                "text": [
                    "the cat and the dog",
                    "le chat et la vite de",
                    "",
                ],
            }
        )
    )
    out = df.select(
        "id",
        token_count("text").alias("n"),
        language_id("text").alias("lang"),
        fingerprint("text").alias("fp"),
    ).toPandas().set_index("id")
    assert out.loc[1, "n"] == 5 and out.loc[1, "lang"] == "en"
    assert out.loc[2, "lang"] == "fr"
    assert out.loc[3, "n"] == 0 and out.loc[3, "lang"] == "und"


def test_topk_strategies_agree(spark, sf_dir):
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = similarity.topk_expr(q, emb, k=3).toPandas().sort_values(["q_id", "rank"])
    b = similarity.topk_numpy(q, emb, k=3).toPandas().sort_values(["q_id", "rank"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_lsh_topk_self_hit(spark, sf_dir):
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = similarity.lsh_bucketed_topk(q, emb, k=3).toPandas()
    # a vector's own bucket always contains itself → rank-1 self hit
    rank1 = out[out["rank"] == 1]
    assert (rank1.q_id.to_numpy() == rank1.c_id.to_numpy()).all()


def test_cosine_pairs_lsh_subset_of_exact(spark, sf_dir):
    """The banded-LSH near-dup pairs must be a subset of the all-pairs
    result with identical cosine values (exact verify), and recall must
    clear the band-math expectation at the test threshold."""
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = similarity.cosine_pairs_q(emb, threshold=0.4).toPandas()
    lsh = similarity.cosine_pairs_lsh(
        emb, threshold=0.4, bands=16, planes_per_band=4, seed=202
    ).toPandas()
    e = exact.set_index(["id_a", "id_b"]).cosine
    l = lsh.set_index(["id_a", "id_b"]).cosine
    assert set(l.index) <= set(e.index)
    pd.testing.assert_series_equal(l.sort_index(), e.loc[l.index].sort_index())
    # P(collide in ≥1 band) ≈ 1-(1-(1-θ/π)^4)^16 ≥ 0.87 at cos=0.4;
    # assert a loose floor so seed drift can't silently crater recall
    assert len(l) >= 0.75 * len(e)


def test_multimodal_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs, "doc_id", "text")
    feats = multimodal.decode_features(media, out_dim=8).toPandas()
    assert len(feats) == 5
    assert all(len(f) == 8 for f in feats.features)
    # deterministic: same content → same features (docs 1 and 5 identical)
    f1 = feats.set_index("media_id").loc[1, "features"]
    f5 = feats.set_index("media_id").loc[5, "features"]
    assert list(f1) == list(f5)
    # synthesized text payloads aren't decodable PPM/BMP → the honest
    # production mode fails at execution with the payload named
    with pytest.raises(Exception, match="not a decodable"):
        multimodal.decode_features(media, require_real_codec=True).count()


def _ppm_bytes(img):
    import numpy as np

    h, w, _ = img.shape
    return b"P6\n# test comment\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img
    ).tobytes()


def _bmp_bytes(img):
    """Uncompressed 24-bit bottom-up BMP (BITMAPINFOHEADER)."""
    import numpy as np

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up
        raster += row[:, ::-1].tobytes()  # RGB → BGR
        raster += b"\x00" * (stride - w * 3)
    off = 14 + 40
    size = off + len(raster)
    hdr = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(hdr) + bytes(raster)


def test_real_image_decode_roundtrip():
    """decode_image must recover the exact pixel grid from real PPM and
    BMP byte payloads (row order, channel order, stride padding)."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # odd width → padding
    out_ppm = multimodal.decode_image(_ppm_bytes(img))
    assert out_ppm is not None and np.array_equal(out_ppm, img)
    out_bmp = multimodal.decode_image(_bmp_bytes(img))
    assert out_bmp is not None and np.array_equal(out_bmp, img)
    # non-images and truncated payloads are refused, not misread
    assert multimodal.decode_image(b"hello world") is None
    assert multimodal.decode_image(_ppm_bytes(img)[:-10]) is None
    assert multimodal.decode_image(_bmp_bytes(img)[:40]) is None


def _png_filter_rows(data, bpp, filters):
    """Filter-encode (rows, stride) int32 byte data per RFC 2083 §6."""
    import numpy as np

    h = data.shape[0]
    filters = filters or [0] * h
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = data[y]
        prev = data[y - 1] if y else np.zeros_like(cur)
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = cur - pred
        raw += bytes([f]) + (enc % 256).astype(np.uint8).tobytes()
    return raw


def _png_bytes(img, color_type=2, filters=None, palette=None, interlace=0,
               bit_depth=8, low_byte=0x7F):
    """Spec-following PNG encoder for the round-trip tests: real zlib
    stream, real chunk CRCs, arbitrary per-scanline filter choice (the
    decoder must UNDO whichever filter each line declares), optional
    REAL Adam7 interlacing (seven filtered sub-images) and 16-bit
    samples (high byte = the 8-bit test pixel, low byte constant)."""
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bps = bit_depth // 8
    bpp = ch * bps

    def row_bytes(sub):  # (ph, pw[, ch]) uint8 → (ph, pw*bpp) int32
        ph, pw = sub.shape[:2]
        samples = sub.reshape(ph, pw * ch).astype(np.int32)
        if bps == 1:
            return samples
        out = np.zeros((ph, pw * ch * 2), dtype=np.int32)
        out[:, 0::2] = samples  # big-endian high byte
        out[:, 1::2] = low_byte
        return out

    if interlace == 0:
        raw = _png_filter_rows(row_bytes(img), bpp, filters)
    else:
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = bytearray()
        for xs, ys, xstep, ystep in passes:
            sub = img[ys::ystep, xs::xstep]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            raw += _png_filter_rows(row_bytes(sub), bpp, filters)

    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, interlace])
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    comp = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-chunk reassembly
    mid = len(comp) // 2
    out += chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    return out + chunk(b"IEND", b"")


def test_png_decode_roundtrip():
    """decode_png must invert every scanline filter and color type the
    encoder can emit: RGB under all five filters, greyscale, RGBA
    (alpha dropped), grey+alpha, palette; multi-chunk IDAT; r9 — REAL
    Adam7 interlacing and 16-bit high-byte reduction; and refuse
    sub-8-bit, corrupt-adler, and truncated payloads."""
    import numpy as np

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    for filters in ([0] * 6, [1] * 6, [2] * 6, [3] * 6, [4] * 6,
                    [0, 1, 2, 3, 4, 2]):
        got = multimodal.decode_image(_png_bytes(img, 2, list(filters)))
        assert got is not None and np.array_equal(got, img), filters
    grey = rng.integers(0, 256, (4, 9), dtype=np.uint8)
    got = multimodal.decode_png(_png_bytes(grey, 0, [4, 1, 3, 2]))
    assert np.array_equal(got, np.repeat(grey[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    got = multimodal.decode_png(_png_bytes(rgba, 6, [1, 4, 3]))
    assert np.array_equal(got, rgba[:, :, :3])
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    got = multimodal.decode_png(_png_bytes(ga, 4, [2, 4, 1]))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (4, 6), dtype=np.uint8)
    got = multimodal.decode_png(_png_bytes(idx, 3, None, palette=pal.tobytes()))
    assert np.array_equal(got, pal[idx])
    # r9: REAL Adam7 interlacing — every pass its own filtered
    # sub-image, scattered back by the pass grid (mixed filters too)
    for filters in (None, [4, 2, 1, 3, 0]):
        got = multimodal.decode_png(_png_bytes(img, 2, filters, interlace=1))
        assert np.array_equal(got, img), "adam7 rgb"
    big = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)  # > one 8x8 tile
    assert np.array_equal(
        multimodal.decode_png(_png_bytes(big, 2, [3, 4], interlace=1)), big
    )
    tiny = rng.integers(0, 256, (1, 2, 3), dtype=np.uint8)  # empty passes
    assert np.array_equal(
        multimodal.decode_png(_png_bytes(tiny, 2, None, interlace=1)), tiny
    )
    grey7 = rng.integers(0, 256, (7, 7), dtype=np.uint8)
    assert np.array_equal(
        multimodal.decode_png(_png_bytes(grey7, 0, [1, 2], interlace=1)),
        np.repeat(grey7[:, :, None], 3, axis=2),
    )
    # r9: 16-bit samples reduce to their high byte, plain and interlaced
    assert np.array_equal(
        multimodal.decode_png(_png_bytes(img, 2, [4, 3, 2], bit_depth=16)), img
    )
    assert np.array_equal(
        multimodal.decode_png(
            _png_bytes(img, 2, [1], interlace=1, bit_depth=16, low_byte=3)
        ),
        img,
    )
    # refusals: sub-8-bit depth, 16-bit palette, corrupt zlib,
    # truncation, out-of-range palette index
    depth4 = bytearray(_png_bytes(img, 2))
    depth4[24] = 4  # IHDR bit-depth byte
    assert multimodal.decode_png(bytes(depth4)) is None
    pal16 = rng.integers(0, 5, (4, 6), dtype=np.uint8)
    palb = rng.integers(0, 256, (5, 3), dtype=np.uint8).tobytes()
    assert multimodal.decode_png(
        _png_bytes(pal16, 3, None, palette=palb, bit_depth=16)
    ) is None
    good = _png_bytes(img, 2)
    corrupt = bytearray(good)
    corrupt[-20] ^= 0xFF  # inside the second IDAT payload
    assert multimodal.decode_png(bytes(corrupt)) is None
    assert multimodal.decode_png(good[:40]) is None
    bad_idx = np.full((2, 2), 9, dtype=np.uint8)
    assert multimodal.decode_png(
        _png_bytes(bad_idx, 3, None, palette=pal.tobytes())
    ) is None


def test_real_codec_features_through_spark(spark):
    """End-to-end: real PPM/BMP payloads through the distributed decode
    stage under require_real_codec=True, features = hand-computed luma
    grid of the decoded pixels."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 256, (6, 6, 3), dtype=np.uint8) for _ in range(4)]
    payloads = [
        _ppm_bytes(imgs[0]), _bmp_bytes(imgs[1]), _ppm_bytes(imgs[2]), _bmp_bytes(imgs[3]),
    ]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [0, 1, 2, 3], "content": payloads}),
        "media_id bigint, content binary",
    )
    out = (
        multimodal.decode_features(media, out_dim=9, require_real_codec=True)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    for i, img in enumerate(imgs):
        exp = multimodal.image_features(img, 9)
        assert np.allclose(np.array(out.loc[i, "features"]), exp)
        assert out.loc[i, "n_bytes"] == len(payloads[i])


def test_frame_sample_plan(spark, docs):
    media = multimodal.synthesize_media(docs, "doc_id", "text")
    plan = multimodal.frame_sample_plan(media, every_n=10).toPandas()
    assert (plan.frame_idx % 10 == 0).all()
    assert plan.media_id.nunique() == 5


def test_prefix_filter_lossless(spark, sf_dir):
    """PPJoin prefix filtering must return exactly the full self-join's
    pair set at any threshold (lemma + integer prefix-length guard)."""
    from pandarallel_spark.operators.dedup import ngram_jaccard_pairs
    from pandarallel_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.3, 0.5, 0.7):
        on = set(
            map(tuple, ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=t, prefix_filter=True
            ).collect())
        )
        off = set(
            map(tuple, ngram_jaccard_pairs(
                docs, "doc_id", "text", n=3, threshold=t, prefix_filter=False
            ).collect())
        )
        assert on == off, f"threshold {t}: prefix={len(on)} full={len(off)}"


def test_auto_protect_hot_shingles(spark):
    """A heavy-tailed corpus (one boilerplate 3-gram in 50% of docs)
    must flip the auto prefix filter ON, bound the candidate join, and
    return exactly the unprotected pair set (losslessness)."""
    import pandas as pd

    from pandarallel_spark.operators.dedup import (
        _shingle_table,
        _should_prefix_filter,
        ngram_jaccard_pairs,
    )

    n_docs = 400
    hot = "click here now"
    rows = []
    for i in range(n_docs):
        body = f"unique{i}a token{i}b word{i}c filler{i}d tail{i}e"
        rows.append((i, f"{hot} {body}" if i % 2 == 0 else body))
    # two genuine near-dups sharing most of their shingles
    rows.append((900, "alpha beta gamma delta epsilon zeta eta theta"))
    rows.append((901, "alpha beta gamma delta epsilon zeta eta iota"))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )

    sh = _shingle_table(docs, "doc_id", "text", 3)
    assert _should_prefix_filter(sh), "hot shingle must trigger protection"
    # uniform corpus: plain join stays chosen
    uni = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"u{i}a u{i}b u{i}c u{i}d u{i}e") for i in range(n_docs)],
            columns=["doc_id", "text"],
        )
    )
    assert not _should_prefix_filter(_shingle_table(uni, "doc_id", "text", 3))

    auto = set(
        map(tuple, ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect())
    )
    plain = set(
        map(
            tuple,
            ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.5, prefix_filter=False
            ).collect(),
        )
    )
    assert auto == plain and (900, 901) in {(a, b) for a, b, _ in auto}

    # bounded candidates: the hot shingle (f=200 → ~20k pair slots in
    # the plain join) must land in almost no prefixes — the prefix
    # join's intersection row count stays linear-ish in docs
    from pyspark.sql import functions as F

    freq = sh.groupBy("__s__").agg(F.count(F.lit(1)).alias("__f__"))
    plain_rows = freq.agg(
        F.sum(F.col("__f__") * (F.col("__f__") - 1) / 2)
    ).first()[0]
    assert plain_rows > 4000  # the skew is real
    # with rare-first ordering the hot shingle is never in a prefix of
    # these 8-shingle docs (prefix length = |x| - ceil(0.5|x|) + 1 = 4 of
    # 8 ranks, hot ranks last) → candidate pairs ≈ true near-dups only
    from pandarallel_spark.operators.dedup import _prefix_candidates

    cand = _prefix_candidates(sh, threshold=0.5).count()
    assert cand < 50, f"prefix candidates not bounded: {cand}"


def test_connected_components_shapes(spark):
    """Chain, triangle, and disjoint pair — min-label propagation must
    converge to min-id components across multi-hop chains."""
    import pandas as pd

    from pandarallel_spark.operators.graph import cluster_survivors, connected_components

    # components: {1,2,3,4 chain}, {10,11,12 triangle}, {20,21}
    edges = pd.DataFrame(
        {
            "id_a": [1, 2, 3, 10, 10, 11, 20],
            "id_b": [2, 3, 4, 11, 12, 12, 21],
        }
    )
    cc = (
        connected_components(spark.createDataFrame(edges))
        .toPandas()
        .sort_values("node", ignore_index=True)
    )
    got = dict(zip(cc.node, cc.component))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    surv = cluster_survivors(spark.createDataFrame(edges)).toPandas()
    assert sorted(surv.survivor) == [1, 10, 20]
    assert (surv.component == surv.survivor).all()


def test_connected_components_long_chain_raises_then_converges(spark):
    """Propagation on a path graph with diameter > max_iter must RAISE
    (silent wrong clusters are the failure mode), and converge given
    enough rounds."""
    import pandas as pd
    import pytest as _pytest

    from pandarallel_spark.operators.graph import connected_components

    n = 12
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3, algorithm="propagation")
    cc = connected_components(
        edges, max_iter=n + 1, algorithm="propagation"
    ).toPandas()
    assert (cc.component == 0).all() and len(cc) == n


def test_star_contraction_beats_diameter(spark):
    """r9 (verdict task 4): the alternating large-star/small-star
    contraction must label a diameter-200 path in O(log² n) rounds —
    far below the diameter that bounds propagation — with identical
    labels."""
    import pandas as pd

    from pandarallel_spark.operators.graph import connected_components

    n = 200
    # shuffled ids so min-ids aren't laid out along the chain
    perm = list(range(0, 2 * n, 2))[::-1]
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [perm[i] for i in range(n - 1)],
             "id_b": [perm[i + 1] for i in range(n - 1)]}
        )
    )
    # diameter 199 ≫ 20 rounds: propagation cannot finish, star must
    cc = connected_components(edges, max_iter=20, algorithm="star").toPandas()
    assert len(cc) == n
    assert (cc.component == min(perm)).all()


def test_star_matches_propagation_random_graph(spark):
    """Differential: star (the new default) and propagation agree
    node-for-node on a random multi-component graph with dup edges,
    reversed edges, and self-loops."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.operators.graph import connected_components

    rng = np.random.default_rng(9)
    a = rng.integers(0, 120, 300)
    off = rng.integers(1, 15, 300)
    pdf = pd.DataFrame({"id_a": a, "id_b": (a + off) % 120})
    pdf.loc[295:, "id_b"] = pdf.loc[295:, "id_a"]  # self-loops
    edges = spark.createDataFrame(pdf)
    star = (
        connected_components(edges)  # default algorithm
        .toPandas().sort_values("node", ignore_index=True)
    )
    prop = (
        connected_components(edges, max_iter=60, algorithm="propagation")
        .toPandas().sort_values("node", ignore_index=True)
    )
    assert len(star) == len(star.node.unique())  # one row per node
    pd.testing.assert_frame_equal(star, prop)
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(edges, algorithm="bfs")


def test_cosine_lsh_bucket_tiling_exact(spark, sf_dir):
    """Block-pair tiling of the bucket verify (per-task memory bound for
    hot buckets) must emit exactly the untiled pair set — including
    duplicate-heavy buckets where every row shares one signature."""
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(threshold=0.4, bands=8, planes_per_band=4, seed=202)
    tiled = similarity.cosine_pairs_lsh(emb, verify_block=3, **kw).toPandas()
    whole = similarity.cosine_pairs_lsh(emb, verify_block=1 << 20, **kw).toPandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        tiled.sort_values(key).reset_index(drop=True),
        whole.sort_values(key).reset_index(drop=True),
    )


def test_pii_redaction_semantics(spark):
    """Each category redacts with its tag; counts reflect the chained
    inputs; clean text passes through untouched."""
    from pandarallel_spark.operators.text import pii_counts, redact_pii

    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "ssn 123-45-6789 phone 555-123-4567"),
        (3, "server at 192.168.0.1 port"),
        (4, "clean text with nothing sensitive"),
        (5, "two mails a@b.io c@d.co and ip 10.0.0.7"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "t"]))
    out = (
        df.select("id", redact_pii("t").alias("r"), *[
            c.alias(n) for n, c in pii_counts("t").items()
        ])
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc[1, "r"] == "mail <EMAIL> now" and out.loc[1, "n_email"] == 1
    assert out.loc[2, "r"] == "ssn <SSN> phone <PHONE>"
    assert out.loc[2, "n_ssn"] == 1 and out.loc[2, "n_phone"] == 1
    assert out.loc[3, "r"] == "server at <IP> port" and out.loc[3, "n_ipv4"] == 1
    assert out.loc[4, "r"] == rows[3][1]
    assert (out.loc[4, ["n_email", "n_ssn", "n_phone", "n_ipv4"]] == 0).all()
    assert out.loc[5, "r"] == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert out.loc[5, "n_email"] == 2


def test_stratified_sample_deterministic_and_proportional(spark):
    """Per-stratum keep rates land near the requested fractions, the
    kept set is identical across partitionings, and NULL ids drop."""
    from pandarallel_spark.operators.sampling import stratified_sample

    n = 4000
    pdf = pd.DataFrame(
        {
            "id": pd.array(
                [None if i % 997 == 0 else i for i in range(n)], dtype="Int64"
            ),
            "src": ["a" if i % 2 == 0 else "b" for i in range(n)],
        }
    )
    fr = {"a": 0.8, "b": 0.2}
    kept = []
    for parts in (2, 13):
        df = spark.createDataFrame(pdf).repartition(parts)
        out = stratified_sample(df, "src", fr, "id").toPandas()
        kept.append(set(out["id"].dropna().astype(int)))
        assert out["id"].notna().all()  # NULL ids never kept
        rates = out.groupby("src").size() / pdf.groupby("src").size()
        assert abs(rates["a"] - 0.8) < 0.05 and abs(rates["b"] - 0.2) < 0.05
    assert kept[0] == kept[1]


def test_token_docfreq_hand_computed(spark):
    from pandarallel_spark.operators.text import token_docfreq, with_mean_token_docfreq

    rows = [(1, "cat dog"), (2, "cat cat bird"), (3, "cat fish")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "t"]))
    dfreq = {
        r.token: r.doc_freq for r in token_docfreq(df, "id", "t").collect()
    }
    assert dfreq == {"cat": 3, "dog": 1, "bird": 1, "fish": 1}
    scored = (
        with_mean_token_docfreq(df, "id", "t")
        .toPandas()
        .set_index("id")["mean_token_docfreq"]
    )
    # doc 2 token multiset: cat,cat,bird → (3+3+1)/3
    assert scored.loc[1] == (3 + 1) / 2
    assert scored.loc[2] == (3 + 3 + 1) / 3
    assert scored.loc[3] == (3 + 1) / 2


def test_chunk_documents_semantics(spark):
    """Fixed-size token windows with stride: window starts at every
    i*stride < n, last window truncates, empty docs yield nothing,
    50%-overlap windows share their tails."""
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    " ".join(f"t{i}" for i in range(10)),
                    "a b c",
                    "   ",
                ],
            }
        )
    )
    from pandarallel_spark.operators.text import chunk_documents

    out = (
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, stride=2)
        .toPandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_idx) == [0, 1, 2, 3, 4]  # ceil(10/2) = 5 windows
    assert d1.iloc[0].chunk_text == "t0 t1 t2 t3"
    assert d1.iloc[1].chunk_text == "t2 t3 t4 t5"  # 50% overlap
    assert d1.iloc[4].chunk_text == "t8 t9"  # truncated tail
    assert list(d1.n_tokens) == [4, 4, 4, 4, 2]
    d2 = out[out.doc_id == 2]
    assert list(d2.chunk_text) == ["a b c", "c"]
    assert (out.doc_id != 3).all()  # whitespace-only doc: no chunks
    with pytest.raises(ValueError, match="positive"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=0)


# ---------------------------------------------------------------------------
# exact substring duplication (ExactSubstr)
# ---------------------------------------------------------------------------


def _naive_spans(texts, k, min_count=2):
    """Reference implementation: count every k-token shingle globally,
    merge duplicated-shingle positions into maximal spans per doc."""
    import re
    from collections import Counter

    toks = {
        d: [t for t in re.split(r"\s+", txt.lower().strip()) if t]
        for d, txt in texts
    }
    counts = Counter()
    pos_rows = []
    for d, tk in toks.items():
        for p in range(len(tk) - k + 1):
            g = " ".join(tk[p : p + k])
            counts[g] += 1
            pos_rows.append((d, p, g))
    spans = []
    for d in toks:
        seeds = sorted(p for dd, p, g in pos_rows if dd == d and counts[g] >= min_count)
        cur = None
        for p in seeds:
            if cur is not None and p <= cur[1] - k + 1 + k:  # p <= prev_pos + k
                cur = (cur[0], max(cur[1], p + k - 1))
            else:
                if cur:
                    spans.append((d, *cur))
                cur = (p, p + k - 1)
        if cur:
            spans.append((d, *cur))
    return sorted(spans)


def test_substring_spans_hand_computed(spark):
    texts = [
        (1, "a b c d e f g h"),        # "c d e f" shared with doc 2
        (2, "x y c d e f z w"),
        (3, "p q r s p q r s p q"),    # within-doc repeat of "p q r s"
        (4, "unique tokens only appear here once"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    out = dedup.duplicated_substring_spans(sdf, "doc_id", "text", k=4).toPandas()
    got = sorted(zip(out.doc_id, out.span_start, out.span_end))
    assert got == _naive_spans(texts, k=4)
    # doc 3: "p q r s" at 0 and 4 plus the bridging windows → one span 0..9
    assert (3, 0, 9) in got
    assert not any(d == 4 for d, _, _ in got)


def test_substring_spans_random_vs_naive(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → natural repeats
    texts = [
        (d, " ".join(rng.choice(vocab, rng.integers(5, 40))))
        for d in range(30)
    ]
    sdf = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    for k in (3, 5):
        out = dedup.duplicated_substring_spans(sdf, "doc_id", "text", k=k).toPandas()
        got = sorted(zip(out.doc_id, out.span_start, out.span_end))
        assert got == _naive_spans(texts, k=k), f"k={k}"


def test_strip_duplicated_spans(spark):
    texts = [
        (1, "a b c d e f g h"),
        (2, "x y c d e f z w"),
        (3, "Unique Mixed-Case text stays byte-identical here"),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    out = (
        dedup.strip_duplicated_spans(sdf, "doc_id", "text", k=4)
        .toPandas().set_index("doc_id")
    )
    # docs 1/2 share "c d e f": windows c..f duplicated → span covers c-f
    assert out.loc[1, "text_deduped"] == "a b g h"
    assert out.loc[2, "text_deduped"] == "x y z w"
    # untouched doc keeps ORIGINAL text (case + spacing preserved)
    assert out.loc[3, "text_deduped"] == texts[2][1]


def test_substring_spans_keep_first(spark):
    """Lee et al. survivor policy: the globally-first occurrence of a
    duplicated passage survives; later copies are stripped."""
    texts = [
        (1, "a b c d e f g h"),
        (2, "x y c d e f z w"),   # later copy of "c d e f"
        (3, "p q r s p q r s p q"),  # within-doc repeat
    ]
    sdf = spark.createDataFrame(pd.DataFrame(texts, columns=["doc_id", "text"]))
    out = dedup.duplicated_substring_spans(
        sdf, "doc_id", "text", k=4, keep_first=True
    ).toPandas()
    got = sorted(zip(out.doc_id, out.span_start, out.span_end))
    # doc 1 holds the first occurrence → untouched; doc 2's copy flagged
    assert got[0][0] != 1
    assert (2, 2, 5) in got
    # doc 3: first occurrences of its grams are at pos 0-3; the later
    # windows 4,5,6 seed one merged span 4..9 (the first "p q r s" stays)
    assert (3, 4, 9) in got
    stripped = (
        dedup.strip_duplicated_spans(sdf, "doc_id", "text", k=4, keep_first=True)
        .toPandas().set_index("doc_id")
    )
    assert stripped.loc[1, "text_deduped"] == texts[0][1]  # original, untouched
    assert stripped.loc[2, "text_deduped"] == "x y z w"
    assert stripped.loc[3, "text_deduped"] == "p q r s"


def test_substring_spans_rejections(spark):
    sdf = spark.createDataFrame(
        pd.DataFrame([(1, "a b c")], columns=["doc_id", "text"])
    )
    with pytest.raises(ValueError, match="k must be"):
        dedup.duplicated_substring_spans(sdf, "doc_id", "text", k=1)
    with pytest.raises(ValueError, match="min_count"):
        dedup.duplicated_substring_spans(sdf, "doc_id", "text", k=3, min_count=1)


def test_l2_normalize_jvm_side(spark):
    """Unit-L2 normalization: pure JVM expressions, zero-vector
    passthrough, norms land at 1."""
    import numpy as np

    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "v": [[3.0, 4.0], [0.0, 0.0], [1.0, 1.0]],
    })
    sdf = spark.createDataFrame(pdf, "id bigint, v array<float>")
    out = (
        sdf.select("id", similarity.l2_normalize("v").alias("n"))
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert np.allclose(out.loc[0, "n"], [0.6, 0.8], atol=1e-6)
    assert list(out.loc[1, "n"]) == [0.0, 0.0]  # zero vector untouched
    assert abs(np.linalg.norm(out.loc[2, "n"]) - 1.0) < 1e-6
    from pandarallel_spark.plans import scale_audit

    assert scale_audit(sdf.select(similarity.l2_normalize("v"))).python_free


def test_random_projection_matches_numpy_and_preserves_geometry(spark, sf_dir):
    """random_projection must equal the driver-side numpy projection
    bit-for-bit (same seeded matrix), be deterministic across reruns,
    and roughly preserve pairwise distances (JL property, fixed seed)."""
    import numpy as np

    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    in_pdf = emb.select("vec_id", "embedding").toPandas()
    X = np.stack(in_pdf.embedding.apply(np.asarray).to_numpy()).astype("float64")
    in_dim = X.shape[1]
    out = (
        similarity.random_projection(emb, "embedding", out_dim=8, seed=7)
        .select("vec_id", "embedding_rp8")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    rng = np.random.default_rng(7)
    R = (rng.standard_normal((in_dim, 8)) / np.sqrt(8)).astype("float64")
    Xs = np.stack(
        in_pdf.sort_values("vec_id").embedding.apply(np.asarray).to_numpy()
    ).astype("float64")
    want = (Xs @ R).astype("float32")
    got = np.stack(out["embedding_rp8"].apply(np.asarray).to_numpy())
    assert np.array_equal(got, want)
    # determinism across a second plan
    out2 = (
        similarity.random_projection(emb, "embedding", out_dim=8, seed=7)
        .select("vec_id", "embedding_rp8")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    got2 = np.stack(out2["embedding_rp8"].apply(np.asarray).to_numpy())
    assert np.array_equal(got, got2)
    # JL sanity: mean relative distortion of pairwise sq-distances small
    n = min(len(Xs), 60)
    d_in = ((Xs[:n, None, :] - Xs[None, :n, :]) ** 2).sum(-1)
    Yd = got[:n].astype("float64")
    d_out = ((Yd[:, None, :] - Yd[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(n, 1)
    ratio = d_out[iu] / np.maximum(d_in[iu], 1e-12)
    assert 0.5 < np.median(ratio) < 1.5


def test_normalize_text_expr_and_unicode(spark):
    """Canonicalization: the expr tier is pure JVM (audited); the
    Unicode tier matches python's unicodedata on NFKC + accent
    stripping; cross-encoding duplicates collapse to one key."""
    import unicodedata

    from pandarallel_spark.operators.text import normalize_text, normalize_text_expr
    from pandarallel_spark.plans import scale_audit

    rows = [
        (1, "  Hello\tWORLD \x07 "),            # controls + whitespace
        (2, "Café du Marché"),          # precomposed é
        (3, "Café du Marché"),        # decomposed e + ́
        (4, "ﬁne ＴＥＸＴ"),  # ﬁ ligature + fullwidth TEXT
            # non-Latin marks OUTSIDE U+0300-036F (review finding r7: the
        # old class missed every other Mn block) - Cyrillic stress
        # mark, Hebrew niqqud, Arabic harakat
        (5, "\u0432\u043e\u0434\u0430\u0301"), (6, "\u0432\u043e\u0434\u0430"),
        (7, "\u05e9\u05b8\u05c1\u05dc\u05d5\u05b9\u05dd"), (8, "\u05e9\u05dc\u05d5\u05dd"),
        (9, "\u0645\u064e\u062f\u0652\u0631\u064e\u0633\u064e\u0629"), (10, "\u0645\u062f\u0631\u0633\u0629"),
    ]
    sdf = spark.createDataFrame(rows, "id bigint, t string")
    # expr tier: JVM only
    e = sdf.select("id", normalize_text_expr("t").alias("n"))
    assert scale_audit(e).python_free
    got = {r.id: r.n for r in e.collect()}
    assert got[1] == "hello world"
    # unicode tier: NFKC + accent strip — 2 and 3 collapse; ligature and
    # fullwidth fold
    out = {
        r.id: r.t_norm
        for r in normalize_text(
            sdf, "t", form="NFKC", strip_accents=True
        ).collect()
    }
    assert out[2] == out[3] == "cafe du marche"
    assert out[4] == "fine text"
    # cross-block mark stripping (the load-bearing r7 cases are the
    # Hebrew niqqud and Arabic harakat rows — their marks live outside
    # U+0300-036F and survived the old class)
    assert out[5] == out[6]
    assert out[7] == out[8]
    assert out[9] == out[10]
    # differential vs python for the accent+NFKC pipeline
    for rid, raw in rows:
        s = "".join(
            ch for ch in unicodedata.normalize("NFD", raw.lower())
            if unicodedata.category(ch) != "Mn"
        )
        s = unicodedata.normalize("NFKC", unicodedata.normalize("NFC", s))
        s = " ".join(s.replace("\x07", " ").split())
        assert out[rid] == s, (rid, out[rid], s)
    with pytest.raises(ValueError, match="NFC/NFKC"):
        normalize_text(sdf, "t", form="NFKX")


def test_exact_dedup_keep_by_policy(spark):
    """keep_by survivor policy: the row maximizing the expression wins,
    ties fall back to min id — keep-longest is the common cleanup
    choice."""
    from pandarallel_spark.operators.dedup import exact_dedup

    rows = [
        (1, "k1", "short"),
        (2, "k1", "the longest text wins here"),
        (3, "k1", "medium text"),
        (4, "k2", "same"),
        (5, "k2", "same"),  # tie on length → min id (4) survives
    ]
    sdf = spark.createDataFrame(rows, "id bigint, k string, text string")
    out = exact_dedup(sdf, ["k"], "id", keep_by=F.length("text")).toPandas()
    assert sorted(out.id) == [2, 4]
    # default policy unchanged: min id
    out2 = exact_dedup(sdf, ["k"], "id").toPandas()
    assert sorted(out2.id) == [1, 4]


def test_ivf_pq_recall_determinism_and_rejections(spark, sf_dir):
    """IVF-PQ (r8): both training modes hit a recall floor against the
    exact brute-force top-k, the k-means path is deterministic across
    builds (seeded Lloyd, int-grid centroids), every query returns
    exactly k rows, and the shape guards fire."""
    import numpy as np

    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in similarity.topk_numpy(q, emb, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.c_id)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.c_id)
        assert all(len(v) == 5 for v in got.values())  # k rows per query
        return float(np.mean([
            len(got.get(qid, set()) & v) / len(v) for qid, v in exact.items()
        ]))

    kw = dict(k=5, n_centroids=16, nprobe=4, m=8, n_codes=16, rerank=32)
    r_anchor = recall(similarity.ivf_pq_topk(q, emb, train="anchors", **kw).collect())
    km1 = similarity.ivf_pq_topk(q, emb, train="kmeans", seed=7, **kw).collect()
    km2 = similarity.ivf_pq_topk(q, emb, train="kmeans", seed=7, **kw).collect()
    assert sorted(map(tuple, km1)) == sorted(map(tuple, km2))  # deterministic
    r_kmeans = recall(km1)
    # measured 0.90 / 0.94 at sf0.01 — generous floors so codebook
    # tweaks don't flap the test, tight enough to catch a broken ADC
    assert r_anchor >= 0.75, r_anchor
    assert r_kmeans >= 0.8, r_kmeans
    # ADC ordering is load-bearing: with rerank >= corpus/nprobe the
    # shortlist covers every probed candidate, so results must EQUAL
    # ivf_topk's exact-rerank output row for row
    full = similarity.ivf_pq_topk(
        q, emb, k=5, n_centroids=16, nprobe=4, m=8, n_codes=16,
        rerank=10_000, train="anchors",
    ).collect()
    flat = similarity.ivf_topk(q, emb, k=5, n_centroids=16, nprobe=4).collect()
    assert sorted((r.q_id, r.c_id, r.score) for r in full) == sorted(
        (r.q_id, r.c_id, r.score) for r in flat
    )
    with pytest.raises(ValueError, match="divisible"):
        similarity.ivf_pq_topk(q, emb, m=7)
    with pytest.raises(ValueError, match="anchors"):
        similarity.ivf_pq_topk(q, emb, train="pca")


# ---------------------------------------------------------------------------
# r9: MinHash-LSH exact-fingerprint pre-collapse (hot-bucket cap)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_heavy_docs(spark):
    """Pathological duplicate-heavy corpus: 300 identical copies of one
    boilerplate doc (the r8 verdict's scale-killer — every copy collides
    in ALL bands) plus one near-dup pair and one unrelated doc."""
    boiler = "subscribe to our newsletter for daily updates and offers today"
    rows = [(i, boiler) for i in range(300)]
    rows += [
        (1000, "the quick brown fox jumps over the lazy dog"),
        (1001, "the quick brown fox jumps over the lazy cat"),
        (2000, "completely different words entirely here now friend"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_minhash_collapse_bounds_banding_input(spark, dup_heavy_docs):
    """The banding/candidate stage must see ONE row per distinct shingle
    set, not one per document — the structural guarantee that a 1M-copy
    boilerplate cluster costs the same as a single doc."""
    s1 = dedup._set_signature_agg(dup_heavy_docs, "doc_id", "text", 3, 64)
    assert s1.count() == 303  # one signature row per doc
    # boiler ×300 collapses to one set; fox-dog / fox-cat / unrelated
    assert s1.select("__fp__").distinct().count() == 4
    # identical sets carry identical signatures → the set collapse
    # (groupBy fp, min of each permutation) is lossless
    assert (
        s1.groupBy("__fp__")
        .agg(*[F.count_distinct(f"__h{i}__").alias(f"c{i}") for i in range(64)])
        .filter(" or ".join(f"c{i} > 1" for i in range(64)))
        .count()
        == 0
    )


def test_minhash_lsh_dup_heavy_clique_matches_exact(spark, dup_heavy_docs):
    """Differential on the pathological corpus: the collapsed+fanned-out
    result must equal the exact n-gram Jaccard pair set (the naive LSH
    formulation's contract), including all 300·299/2 intra-clique pairs
    at jaccard exactly 1.0."""
    exact = dedup.ngram_jaccard_pairs(
        dup_heavy_docs, "doc_id", "text", n=3, threshold=0.5
    ).toPandas()
    lsh = dedup.minhash_lsh_pairs(
        dup_heavy_docs, "doc_id", "text", n=3, threshold=0.5
    ).toPandas()
    assert len(lsh) == len(exact) == 300 * 299 // 2 + 1  # clique + fox pair
    e = exact.set_index(["id_a", "id_b"]).jaccard.sort_index()
    l = lsh.set_index(["id_a", "id_b"]).jaccard.sort_index()
    pd.testing.assert_series_equal(e, l)
    assert (l.loc[: (299, 299)] == 1.0).all()


def test_minhash_lsh_star_mode_same_components(spark, dup_heavy_docs):
    """intra_pairs='star' emits group_size-1 rows per exact-dup group
    instead of the quadratic clique, with identical transitive closure."""
    from pandarallel_spark.operators.graph import connected_components

    star = dedup.minhash_lsh_pairs(
        dup_heavy_docs, "doc_id", "text", n=3, threshold=0.5,
        intra_pairs="star",
    ).toPandas()
    # 299 star edges (exemplar=0 → members 1..299) + the fox cross pair
    assert len(star) == 300
    intra = star[star.jaccard == 1.0]
    assert len(intra) == 299 and (intra.id_a == 0).all()
    clique = dedup.minhash_lsh_pairs(
        dup_heavy_docs, "doc_id", "text", n=3, threshold=0.5
    )
    cc_star = connected_components(
        spark.createDataFrame(star[["id_a", "id_b"]])
    ).toPandas()
    cc_clique = connected_components(
        clique.select("id_a", "id_b")
    ).toPandas()
    a = cc_star.sort_values("node").reset_index(drop=True)
    b = cc_clique.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="intra_pairs"):
        dedup.minhash_lsh_pairs(
            dup_heavy_docs, "doc_id", "text", intra_pairs="mesh"
        )


def test_minhash_lsh_no_session_cache_leak(spark, docs):
    """r8 verdict task 3: the reused intermediates must not persist into
    the session cache (localCheckpoint, not persist — mirror of the r8
    heavy-hitters fix)."""
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()
    dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    assert cm.isEmpty()


# ---------------------------------------------------------------------------
# r9: similarity query-side collect guards
# ---------------------------------------------------------------------------


def test_similarity_max_queries_guard(spark, sf_dir):
    """Oversized query tables must fail at build time with guidance, via
    a bounded limit(max+1) probe — never a driver-OOM collect; results
    under the cap are unchanged."""
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    for op in (
        similarity.topk_numpy,
        similarity.ivf_topk,
        similarity.ivf_pq_topk,
        similarity.lsh_bucketed_topk,
    ):
        with pytest.raises(ValueError, match="max_queries"):
            op(emb, emb, max_queries=3)
        with pytest.raises(ValueError, match="max_queries"):
            op(q, emb, max_queries=0)
    capped = similarity.topk_numpy(q, emb, k=3, max_queries=5).toPandas()
    free = similarity.topk_numpy(q, emb, k=3).toPandas()
    pd.testing.assert_frame_equal(
        capped.sort_values(["q_id", "rank"]).reset_index(drop=True),
        free.sort_values(["q_id", "rank"]).reset_index(drop=True),
    )


def test_similarity_strict_lazy_covers_explicit_dim(spark, sf_dir):
    """ADVICE r8: strictLazy must gate the eager index builders even
    when dim= is passed explicitly (previously only _infer_dim checked)."""
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        # topk_numpy takes no dim (no unrolled SQL) but its query
        # collect is gated all the same
        with pytest.raises(RuntimeError, match="strictLazy"):
            similarity.topk_numpy(q, emb)
        for op in (
            similarity.ivf_topk,
            similarity.ivf_pq_topk,
            similarity.lsh_bucketed_topk,
        ):
            with pytest.raises(RuntimeError, match="strictLazy"):
                op(q, emb, dim=64)
    finally:
        spark.conf.unset("spark.pandarallel_spark.strictLazy")


def test_ivf_pq_kmeans_dist_recall_parity(spark, sf_dir):
    """r9 (verdict task 6): the distributed codebook trainer must be
    deterministic and reach recall parity with the driver-sample
    trainer at equal seeds (here the head IS representative, so the two
    should land in the same quality band)."""
    import numpy as np

    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {}
    for r in similarity.topk_numpy(q, emb, k=5).collect():
        exact.setdefault(r.q_id, set()).add(r.c_id)

    def recall(rows):
        got = {}
        for r in rows:
            got.setdefault(r.q_id, set()).add(r.c_id)
        assert all(len(v) == 5 for v in got.values())
        return float(np.mean([
            len(got.get(qid, set()) & v) / len(v) for qid, v in exact.items()
        ]))

    kw = dict(k=5, n_centroids=16, nprobe=4, m=8, n_codes=16, rerank=32,
              kmeans_iters=4)
    d1 = similarity.ivf_pq_topk(q, emb, train="kmeans_dist", seed=7, **kw).collect()
    d2 = similarity.ivf_pq_topk(q, emb, train="kmeans_dist", seed=7, **kw).collect()
    assert sorted(map(tuple, d1)) == sorted(map(tuple, d2))  # deterministic
    km = similarity.ivf_pq_topk(q, emb, train="kmeans", seed=7, **kw).collect()
    r_dist, r_drv = recall(d1), recall(km)
    # parity: the full-corpus trainer must not lose to the sample
    # trainer by more than noise, and must hold an absolute floor
    assert r_dist >= r_drv - 0.1, (r_dist, r_drv)
    assert r_dist >= 0.8, r_dist
    # the deterministic hash-sampled training scan also holds the floor
    frac = similarity.ivf_pq_topk(
        q, emb, train="kmeans_dist", seed=7, kmeans_dist_fraction=0.5, **kw
    ).collect()
    assert recall(frac) >= 0.75


def test_jpeg_decode_roundtrip():
    """r9 (verdict task 5): the baseline JPEG decoder must invert the
    in-module encoder across gray/RGB, 4:4:4 and 4:2:0, restart
    intervals, lossy quant, and odd sizes — and reject what it cannot
    honestly decode."""
    import numpy as np

    rng = np.random.default_rng(11)

    # constant gray is numerically lossless with q=1 for EVERY value —
    # the property the graded row's per-v payloads assert
    for v in (1, 63, 126, 254):
        img = np.full((8, 8), v, dtype=np.uint8)
        out = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img))
        assert out is not None and out.shape == (8, 8, 3)
        assert (out == v).all()

    # random gray, non-multiple-of-8 dims: q=1 round trip within ±1
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    out = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img))
    assert out.shape == (13, 21, 3)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1

    # RGB 4:4:4: color-space round trip within a few counts
    img3 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    out3 = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img3))
    assert np.abs(out3.astype(int) - img3.astype(int)).max() <= 3

    # 4:2:0: luma preserved wherever no channel clips (the YCbCr→RGB
    # recombination cancels chroma exactly; clamping breaks it by design)
    img3 = rng.integers(0, 256, (21, 19, 3)).astype(np.uint8)
    o = multimodal.decode_jpeg(
        multimodal.encode_jpeg_baseline(img3, subsample=True)
    )
    assert o.shape == (21, 19, 3)
    y_in = 0.299 * img3[:, :, 0] + 0.587 * img3[:, :, 1] + 0.114 * img3[:, :, 2]
    y_out = 0.299 * o[:, :, 0] + 0.587 * o[:, :, 1] + 0.114 * o[:, :, 2]
    ok = ((o > 0) & (o < 255)).all(axis=2)
    assert ok.mean() > 0.5
    assert np.abs(y_in - y_out)[ok].max() < 2.0

    # restart markers: DRI emitted, predictors reset, exact gray round
    # trip across 4:4:4 and 4:2:0 streams
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    p = multimodal.encode_jpeg_baseline(img, restart_interval=3)
    assert b"\xff\xdd" in p
    out = multimodal.decode_jpeg(p)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1
    assert multimodal.decode_jpeg(
        multimodal.encode_jpeg_baseline(img3, subsample=True, restart_interval=1)
    ).shape == (21, 19, 3)

    # lossy quant still decodes with bounded noise
    qt = np.full((8, 8), 16, dtype=np.int64)
    outq = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img, quant=qt))
    rmse = float(
        np.sqrt(((outq[:, :, 0].astype(float) - img.astype(float)) ** 2).mean())
    )
    assert rmse < 10.0

    # honest refusals: non-JPEG, truncated, lossless SOF
    good = multimodal.encode_jpeg_baseline(img)
    assert multimodal.decode_jpeg(b"\xff\xd8\xff\xe0junk") is None
    assert multimodal.decode_jpeg(good[:40]) is None
    lossless = bytearray(good)
    i = lossless.find(b"\xff\xc0")
    lossless[i + 1] = 0xC3  # flip SOF0 → SOF3 (lossless — unsupported)
    assert multimodal.decode_jpeg(bytes(lossless)) is None
    # routed through the general entry point
    assert multimodal.decode_image(good) is not None


def test_jpeg_progressive_decode_matches_baseline():
    """r9: the SOF2 progressive path (spectral selection + successive
    approximation + EOB runs) must reconstruct the SAME quantized
    coefficients as the sequential scan — decoded outputs bit-for-bit
    equal across color/subsampling/Al/quant shapes."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 21)).astype(np.uint8)
    img3 = rng.integers(0, 256, (21, 19, 3)).astype(np.uint8)

    for sub in (False, True):
        for al in (0, 1, 2):
            p = multimodal.encode_jpeg_progressive(img3, subsample=sub, Al=al)
            assert b"\xff\xc2" in p  # really SOF2
            got = multimodal.decode_jpeg(p)
            ref = multimodal.decode_jpeg(
                multimodal.encode_jpeg_baseline(img3, subsample=sub)
            )
            assert got is not None and (got == ref).all(), (sub, al)

    # grayscale single-component scans
    pg = multimodal.encode_jpeg_progressive(img, Al=1)
    ref = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img))
    assert (multimodal.decode_jpeg(pg) == ref).all()

    # lossy quant (nonzero AC coefficients through refinement passes)
    qt = np.full((8, 8), 12, np.int64)
    pq = multimodal.encode_jpeg_progressive(img3, quant=qt, Al=1)
    refq = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(img3, quant=qt))
    assert (multimodal.decode_jpeg(pq) == refq).all()

    # smooth image → long EOB runs on both first and refinement passes
    big = rng.integers(100, 110, (48, 64, 3)).astype(np.uint8)
    q8 = np.full((8, 8), 8, np.int64)
    pb = multimodal.encode_jpeg_progressive(big, quant=q8, Al=1)
    refb = multimodal.decode_jpeg(multimodal.encode_jpeg_baseline(big, quant=q8))
    assert (multimodal.decode_jpeg(pb) == refb).all()

    # truncated progressive stream refuses
    assert multimodal.decode_jpeg(pg[: len(pg) // 2]) is None


def test_minhash_lsh_cross_group_fanout(spark):
    """Cross-group fan-out between two exact-dup groups: every member
    pair appears once at the exemplar pair's exact jaccard, with
    id_a < id_b re-normalized (the larger-fp group may hold the smaller
    doc ids)."""
    rows = [
        (10, "the quick brown fox jumps over the lazy dog"),
        (11, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy cat"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    # intra: (10,11) and (1,2) at exactly 1.0
    assert got[(10, 11)] == 1.0 and got[(1, 2)] == 1.0
    # cross: all four member pairs at the same verified jaccard (= 0.75)
    cross = {k: v for k, v in got.items() if k not in ((10, 11), (1, 2))}
    assert set(cross) == {(1, 10), (1, 11), (2, 10), (2, 11)}
    assert len(set(cross.values())) == 1 and abs(next(iter(cross.values())) - 0.75) < 1e-12
    assert len(out) == 6 and not out.duplicated(["id_a", "id_b"]).any()


def test_jpeg_malformed_missing_ac_table_returns_none():
    """Review r9: a crafted progressive header (Ss=0, Se=63) whose AC
    table was never defined must return None, not kill the task with an
    AttributeError deep in the Huffman decoder."""
    import numpy as np

    img = np.full((8, 8), 99, dtype=np.uint8)
    good = bytearray(multimodal.encode_jpeg_baseline(img))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2  # SOF0 → SOF2 so the scan header is honored
    # strip the AC DHT segment (marker 0xC4 with Tc/Th byte 0x10)
    j = good.find(b"\xff\xc4", good.find(b"\xff\xc4") + 2)  # second DHT
    ln = int.from_bytes(good[j + 2:j + 4], "big")
    assert good[j + 4] == 0x10  # really the AC table
    del good[j:j + 2 + ln]
    assert multimodal.decode_jpeg(bytes(good)) is None


def test_ivf_pq_kmeans_dist_validations(spark, sf_dir):
    """Review r9: non-positive training fractions must raise (a silent
    empty training scan returns the seeded codebooks untrained), and
    pure-Python argument rejections fire before any cluster work."""
    from pandarallel_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="kmeans_dist_fraction"):
            similarity.ivf_pq_topk(
                q, emb, train="kmeans_dist", kmeans_dist_fraction=bad
            )
    # under strictLazy every Spark job raises RuntimeError — getting the
    # ValueError instead proves the m-divisibility check precedes the
    # query-collect probe when dim= is explicit
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(ValueError, match="divisible"):
            similarity.ivf_pq_topk(q, emb, dim=64, m=7)
    finally:
        spark.conf.unset("spark.pandarallel_spark.strictLazy")


def test_cluster_survivors_score_policy(spark):
    """r9: quality-based survivor selection — highest score wins, ties
    break to min id, unscored clusters degrade to min-id."""
    import pandas as pd

    from pandarallel_spark.operators.graph import cluster_survivors

    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 21]})
    )
    # cluster {1,2,3}: 2 scores highest; {10,11}: tie 5.0 → min id 10;
    # {20,21}: nobody scored → min id 20
    scores = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3, 10, 11], "score": [1.0, 9.0, 3.0, 5.0, 5.0]})
    )
    out = cluster_survivors(edges, scores=scores).toPandas()
    got = dict(zip(out.component, out.survivor))
    assert got == {1: 2, 10: 10, 20: 20}
    # default policy unchanged
    base = cluster_survivors(edges).toPandas()
    assert sorted(base.survivor) == [1, 10, 20]


def test_cluster_survivors_nan_score_not_crowned(spark):
    """Review r9: NaN orders above every real double in Spark — a
    NaN-scored member must rank BELOW scored members, not win."""
    import numpy as np
    import pandas as pd

    from pandarallel_spark.operators.graph import cluster_survivors

    edges = spark.createDataFrame(pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]}))
    scores = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "score": [np.nan, 9.0, 3.0]})
    )
    out = cluster_survivors(edges, scores=scores).toPandas()
    assert dict(zip(out.component, out.survivor)) == {1: 2}
    # all-NaN cluster degrades to min-id
    all_nan = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "score": [np.nan] * 3})
    )
    out2 = cluster_survivors(edges, scores=all_nan).toPandas()
    assert dict(zip(out2.component, out2.survivor)) == {1: 1}


def test_png_interlaced_huge_header_refused():
    """Review r9: a crafted Adam7 header claiming huge dimensions with a
    tiny IDAT must refuse BEFORE allocating the output buffer."""
    import zlib

    def chunk(typ, payload):
        return (
            len(payload).to_bytes(4, "big") + typ + payload
            + zlib.crc32(typ + payload).to_bytes(4, "big")
        )

    ihdr = (
        (50_000).to_bytes(4, "big") + (50_000).to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 1])  # RGB, Adam7
    )
    crafted = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    assert multimodal.decode_png(crafted) is None


def test_wav_decode_roundtrip_and_features():
    """r9: real PCM WAV decode — 8/16-bit, mono/stereo downmix, chunk
    walking (JUNK skipped, word alignment), refusals for compressed
    formats; audio_features windows are deterministic and bounded."""
    import numpy as np

    rng = np.random.default_rng(21)
    t = np.arange(8000) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)

    # 16-bit mono round trip within quantization error
    wav = multimodal.encode_wav_pcm(sig, rate=16000, bits=16)
    got = multimodal.decode_wav(wav)
    assert got is not None
    mono, rate = got
    assert rate == 16000 and len(mono) == 8000
    assert np.abs(mono - sig).max() < 1.0 / 32768 + 1e-9

    # stereo downmix equals the mono signal (channels are replicas)
    st = multimodal.decode_wav(multimodal.encode_wav_pcm(sig, channels=2))
    assert np.abs(st[0] - mono).max() < 1e-12

    # 8-bit coarser but correct
    lo = multimodal.decode_wav(multimodal.encode_wav_pcm(sig, bits=8))
    assert np.abs(lo[0] - sig).max() < 1.0 / 128 + 1e-9

    # features: loud first half, silent second half → RMS slots reflect it
    half = np.concatenate([sig, np.zeros(8000)])
    f = multimodal.audio_features(
        multimodal.decode_wav(multimodal.encode_wav_pcm(half))[0], 8
    )
    assert len(f) == 8 and f[0] > 0.2 and f[6] < 0.01
    assert 0.0 <= min(f) and max(f) <= 1.0
    # deterministic
    f2 = multimodal.audio_features(
        multimodal.decode_wav(multimodal.encode_wav_pcm(half))[0], 8
    )
    assert list(f) == list(f2)

    # refusals: float format, truncated, junk
    bad = bytearray(wav)
    fmt_at = bad.find(b"fmt ")
    bad[fmt_at + 8] = 3  # IEEE float format code
    assert multimodal.decode_wav(bytes(bad)) is None
    assert multimodal.decode_wav(wav[:20]) is None
    assert multimodal.decode_wav(b"RIFFxxxxWAVE") is None
    assert multimodal.decode_wav(b"not audio") is None


def test_wav_features_through_spark(spark):
    """End-to-end: WAV payloads through the distributed decode stage
    under require_real_codec=True alongside image payloads."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(33)
    sig = rng.uniform(-0.8, 0.8, 2000)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    payloads = [
        multimodal.encode_wav_pcm(sig, bits=16),
        _ppm_bytes(img),
        multimodal.encode_wav_pcm(sig, bits=16, channels=2),
    ]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2, 3],
                      "content": [bytearray(p) for p in payloads]}),
        schema="media_id bigint, content binary",
    )
    out = (
        multimodal.decode_features(media, out_dim=8, require_real_codec=True)
        .toPandas().set_index("media_id")
    )
    assert out.decoded.all()
    expected = multimodal.audio_features(
        multimodal.decode_wav(payloads[0])[0], 8
    )
    assert np.allclose(out.loc[1, "features"], expected)
    assert np.allclose(out.loc[3, "features"], expected)  # stereo ≡ mono


def test_near_dedup_corpus_end_to_end(spark, docs):
    """r9: one-call near-dedup — clusters collapse to one survivor,
    unclustered docs pass through, keep_by switches the survivor."""
    from pandarallel_spark.operators.dedup import near_dedup_corpus

    # docs: 1≈2 (near), 1==5 (exact), 3 unrelated, 4 permutation (not
    # 3-gram-similar) → cluster {1,2,5}, singletons {3,4}
    out = near_dedup_corpus(docs, "doc_id", "text", method="minhash").toPandas()
    assert sorted(out.doc_id) == [1, 3, 4]

    # quality-based survivor: score doc 2 highest → it survives the cluster
    scored = docs.withColumn(
        "q", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
    )
    out2 = near_dedup_corpus(
        scored, "doc_id", "text", method="minhash", keep_by="q"
    ).toPandas()
    assert sorted(out2.doc_id) == [2, 3, 4]

    # ngram method agrees on this corpus
    out3 = near_dedup_corpus(docs, "doc_id", "text", method="ngram").toPandas()
    assert sorted(out3.doc_id) == [1, 3, 4]

    with pytest.raises(ValueError, match="method"):
        near_dedup_corpus(docs, "doc_id", "text", method="bloom")


def test_near_dedup_guards(spark, docs):
    """Review r9: reserved-column collision raises with guidance, and
    strictLazy blocks the eager clustering with the escape named."""
    from pandarallel_spark.operators.dedup import near_dedup_corpus

    clobber = docs.withColumn("__drop__", F.lit(1))
    with pytest.raises(ValueError, match="__drop__"):
        near_dedup_corpus(clobber, "doc_id", "text")
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="strictLazy"):
            near_dedup_corpus(docs, "doc_id", "text")
    finally:
        spark.conf.unset("spark.pandarallel_spark.strictLazy")


def test_per_doc_band_hash_collapse_equals_band_of_min(spark, docs):
    """r15 banding refactor pin: ``minhash_lsh_pairs`` now computes the
    16 band hashes PER DOCUMENT over the signature table and collapses
    them with min(), instead of hashing after the per-set min-collapse
    — valid because members of one fingerprint group share every
    per-permutation min. Assert the two formulations produce the same
    (fp, band-hash) table on a corpus that includes exact duplicates
    (multi-member fingerprint groups)."""
    num_perm, bands = 64, 16
    rpb = num_perm // bands
    s1 = dedup._set_signature_agg(docs, "doc_id", "text", 3, num_perm)
    band_cols = [
        F.expr(
            "xxhash64("
            + ", ".join(f"__h{b * rpb + r}__" for r in range(rpb))
            + f") AS __b{b}__"
        )
        for b in range(bands)
    ]
    new = (
        s1.select("__fp__", *band_cols)
        .groupBy("__fp__")
        .agg(*[F.expr(f"min(__b{b}__) AS __b{b}__") for b in range(bands)])
    )
    old = (
        s1.groupBy("__fp__")
        .agg(*dedup._hmin_exprs(num_perm))
        .select("__fp__", *band_cols)
    )
    key = ["__fp__"] + [f"__b{b}__" for b in range(bands)]
    a = sorted(map(tuple, new.select(*key).collect()))
    b = sorted(map(tuple, old.select(*key).collect()))
    assert a == b and len(a) == 4  # 1==5 collapse → 4 distinct sets


def test_bm25_prune_nonmatching_is_exact_for_positive_topk(spark, docs, sf_dir):
    """r15 §3 candidate pruning: pruned scoring == unpruned scoring
    restricted to score > 0 (a doc sharing no query term scores
    exactly 0.0), stats computed over the FULL corpus either way, and
    the pruning filter sits on the streamed side BELOW the 1-row
    stats attach (only candidates flow through the join and into the
    caller's top-k)."""
    from pandarallel_spark.operators.text import bm25_scores

    terms = ["quick", "cat"]
    full = bm25_scores(docs, "doc_id", "text", terms).toPandas()
    pruned_df = bm25_scores(
        docs, "doc_id", "text", terms, prune_nonmatching=True
    )
    pruned = pruned_df.toPandas()
    # doc 3 shares no term -> present unpruned at exactly 0.0, pruned out
    assert set(full.doc_id) == {1, 2, 3, 4, 5}
    assert float(full[full.doc_id == 3].score.iloc[0]) == 0.0
    keep = full[full.score > 0].sort_values("doc_id").reset_index(drop=True)
    got = pruned.sort_values("doc_id").reset_index(drop=True)
    # identical rows INCLUDING scores: df/N/avgdl must come from the
    # full corpus, not the pruned candidate set
    assert got.equals(keep)
    # plan shape on a parquet-backed corpus (the local-relation corpus
    # above gets its filter evaluated at optimization time): the
    # candidate filter is a Filter over the scan's tf columns, below
    # the stats join
    from pandarallel_spark.sources import load_table

    pq = load_table(spark, sf_dir, "documents")
    pq_pruned = bm25_scores(
        pq, "doc_id", "text", terms, prune_nonmatching=True
    )
    plan = pq_pruned._sc._jvm.PythonSQLUtils.explainString(
        pq_pruned._jdf.queryExecution(), "formatted"
    )
    assert "Filter" in plan and "> 0)" in plan
