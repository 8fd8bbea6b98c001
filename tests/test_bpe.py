"""BPE tokenizer training/encoding (operators/bpe.py).

The load-bearing property is DIFFERENTIAL: the incremental driver
trainer must produce the SAME merge list as a naive
recount-everything-per-merge reference over the same histogram, and
the distributed encoder must reproduce a per-word reference encoding
exactly. Reference frame: Sennrich et al. 2016 (arXiv:1508.07909);
the reference repo (pandarallel) has no tokenizer surface at all."""

import warnings

import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.bpe import (
    END_OF_WORD,
    _merge_word,
    _pairs_of,
    _train_from_histogram,
    bpe_encode,
    train_bpe,
    word_histogram,
)


def _naive_train(hist, num_merges):
    """Sennrich et al. verbatim: recount ALL pairs every iteration,
    take the (count desc, pair asc) best, merge everywhere."""
    words = {i: tuple(w) + (END_OF_WORD,) for i, (w, _) in enumerate(hist)}
    freqs = {i: c for i, (_, c) in enumerate(hist)}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for i, sym in words.items():
            for p in _pairs_of(sym):
                counts[p] = counts.get(p, 0) + freqs[i]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {i: _merge_word(sym, best) for i, sym in words.items()}
    return merges


def _naive_encode(word, merges):
    ranks = {p: i for i, p in enumerate(merges)}
    sym = tuple(word) + (END_OF_WORD,)
    while len(sym) > 1:
        cands = [p for p in _pairs_of(sym) if p in ranks]
        if not cands:
            break
        sym = _merge_word(sym, min(cands, key=lambda p: ranks[p]))
    return list(sym)


_HIST = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("new", 4), ("news", 1), ("lowest", 2), ("wide", 2), ("widen", 1),
]


@pytest.mark.parametrize("n", [1, 5, 20, 200])
def test_incremental_trainer_equals_naive(n):
    assert _train_from_histogram(_HIST, n) == _naive_train(_HIST, n)


def test_trainer_handles_overlapping_pairs_and_exhaustion():
    hist = [("aaaa", 3), ("aa", 2), ("a", 7)]
    got = _train_from_histogram(hist, 50)
    assert got == _naive_train(hist, 50)
    # exhaustion: every word collapses to one symbol, training stops
    assert len(got) < 50


def test_train_bpe_end_to_end_and_histogram(spark):
    docs = spark.createDataFrame(
        [(1, "low low low low low lower newest newest"),
         (2, "newest newest newest newest widest widest widest wide")],
        "id long, text string",
    )
    hist = {
        r["word"]: r["count"]
        for r in word_histogram(docs, "text").collect()
    }
    assert hist == {
        "low": 5, "lower": 1, "newest": 6, "widest": 3, "wide": 1,
    }
    merges = train_bpe(docs, "text", num_merges=10)
    want = _naive_train(sorted(hist.items(), key=lambda kv: (-kv[1], kv[0])), 10)
    assert merges == want
    # the hottest word's pieces collapse all the way to one token
    enc = docs.select(bpe_encode("text", merges).alias("p")).collect()
    pieces = [p for r in enc for p in r["p"]]
    assert "newest" + END_OF_WORD in pieces

    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(docs, "text", num_merges=0)


def test_train_bpe_truncation_warns_with_mass(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha beta beta gamma")], "id long, text string"
    )
    with pytest.warns(UserWarning, match="dropped tail holds"):
        merges = train_bpe(docs, "text", num_merges=3, max_words=2)
    # trained on {alpha:3, beta:2} only — gamma contributes nothing
    want = _naive_train([("alpha", 3), ("beta", 2)], 3)
    assert merges == want


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    docs = spark.createDataFrame(
        [(1, "low lower newest widest new news lowest wide widen"),
         (2, "unseen tokens like zebra survive as char pieces")],
        "id long, text string",
    )
    merges = _train_from_histogram(_HIST, 30)
    rows = docs.select(
        "id", bpe_encode("text", merges).alias("pieces")
    ).orderBy("id").collect()
    for r, text in zip(rows, [
        "low lower newest widest new news lowest wide widen",
        "unseen tokens like zebra survive as char pieces",
    ]):
        want = [p for w in text.split() for p in _naive_encode(w, merges)]
        assert list(r["pieces"]) == want
        # lossless: concatenating pieces restores the words
        joined = "".join(r["pieces"]).replace(END_OF_WORD, " ").strip()
        assert joined == text


def test_train_bpe_strict_lazy_gated(spark):
    docs = spark.createDataFrame([(1, "a b c")], "id long, text string")
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="histogram collect"):
            train_bpe(docs, "text", num_merges=2)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_word_histogram_merge_equals_whole_through_parquet(spark, tmp_path):
    """merge(hist(A), hist(B)) == hist(A ∪ B) row-for-row — including
    through a parquet round-trip of A's histogram, the ingest shape:
    the persisted artifact plus one delta aggregate replays the whole-
    corpus training input, so the corpus is never re-scanned."""
    from pandarallel_spark.operators.bpe import (
        train_bpe_from_histogram,
        word_histogram_merge,
    )

    a = spark.createDataFrame(
        [(1, "low low low lower newest"), (2, "newest newest widest")],
        "id long, text string",
    )
    b = spark.createDataFrame(
        [(3, "newest newest newest widest widest wide low")],
        "id long, text string",
    )
    pth = str(tmp_path / "hist_a")
    word_histogram(a, "text").write.parquet(pth)
    merged = word_histogram_merge(
        spark.read.parquet(pth), word_histogram(b, "text")
    )
    whole = word_histogram(a.unionByName(b), "text")
    as_dict = lambda df: {r["word"]: r["count"] for r in df.collect()}
    assert as_dict(merged) == as_dict(whole)

    # retraining from the merged artifact == training over the union
    assert train_bpe_from_histogram(merged, num_merges=8) == train_bpe(
        a.unionByName(b), "text", num_merges=8
    )


def test_histogram_merge_validation_and_strict_lazy(spark):
    from pandarallel_spark.operators.bpe import (
        train_bpe_from_histogram,
        word_histogram_merge,
    )

    docs = spark.createDataFrame([(1, "a b c")], "id long, text string")
    hist = word_histogram(docs, "text")
    with pytest.raises(ValueError, match="not a word histogram"):
        word_histogram_merge(hist, docs)
    with pytest.raises(ValueError, match="not a word histogram"):
        train_bpe_from_histogram(docs, num_merges=2)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="histogram collect"):
            train_bpe_from_histogram(hist, num_merges=2)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_from_histogram_truncation_warns_like_train_bpe(spark):
    from pandarallel_spark.operators.bpe import train_bpe_from_histogram

    docs = spark.createDataFrame(
        [(1, "alpha alpha alpha beta beta gamma")], "id long, text string"
    )
    hist = word_histogram(docs, "text")
    with pytest.warns(UserWarning, match="dropped tail holds"):
        merges = train_bpe_from_histogram(hist, num_merges=3, max_words=2)
    assert merges == _naive_train([("alpha", 3), ("beta", 2)], 3)


def test_merge_table_persistence_roundtrip(spark, tmp_path):
    """save/load of the trained merge table: rank order exact, encode
    through the reloaded table equals encode through the in-memory
    one, and the lowercase pretokenization stamp is enforced (r12)."""
    from pyspark.sql import functions as F

    from pandarallel_spark.operators.bpe import (
        bpe_encode,
        load_bpe_merges,
        save_bpe_merges,
        train_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new news newest new")],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, "text", 10)
    pth = str(tmp_path / "merges")
    save_bpe_merges(spark, merges, pth)
    back = load_bpe_merges(spark, pth)
    assert back == merges

    a = sorted(
        map(tuple, docs.select(
            "doc_id", bpe_encode("text", merges).alias("p")
        ).collect())
    )
    b = sorted(
        map(tuple, docs.select(
            "doc_id", bpe_encode("text", back).alias("p")
        ).collect())
    )
    assert a == b

    with pytest.raises(ValueError, match="lowercase=True"):
        load_bpe_merges(spark, pth, lowercase=False)
    with pytest.raises(ValueError, match="empty merge table"):
        save_bpe_merges(spark, [], str(tmp_path / "e"))
    with pytest.raises(ValueError, match="not a saved merge table"):
        docs.write.parquet(str(tmp_path / "w"))
        load_bpe_merges(spark, str(tmp_path / "w"))
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="load_bpe_merges"):
            load_bpe_merges(spark, pth)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")
