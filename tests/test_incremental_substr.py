"""Incremental exact-substring dedup (operators/incremental_substr.py).

The load-bearing property is DIFFERENTIAL, like the other two ingest
twins: spans/stripping of a delta against an indexed corpus must equal
the batch operator over OLD ∪ NEW restricted to the new docs (old ids
below new ids so the batch keep_first picks corpus occurrences first),
while the corpus is touched only through the gram-count index."""

import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.dedup import (
    duplicated_substring_spans,
    strip_duplicated_spans,
)
from pandarallel_spark.operators.incremental_substr import (
    duplicated_spans_incremental,
    incremental_substr_corpus,
    strip_spans_incremental,
    substr_index_build,
    substr_index_merge,
)

_K = 4


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


_PASSAGE = "alpha beta gamma delta epsilon zeta eta theta"


@pytest.fixture()
def corpus(spark):
    """OLD (ids 0-2): doc 0 carries the passage; 1 and 2 are unrelated.
    NEW (ids 10-13): 10 embeds the passage verbatim; 11 and 12 SHARE a
    fresh passage absent from the corpus; 13 is clean."""
    old = _mk(spark, [
        (0, "intro words then " + _PASSAGE + " and a tail here"),
        (1, "completely unrelated text about shuffle partitions and joins"),
        (2, "another retained document with its own unique phrasing style"),
    ])
    new = _mk(spark, [
        (10, "new framing sentence " + _PASSAGE + " closing remark words"),
        (11, "one two three four five six seven preface done finally yes"),
        (12, "padding starts now one two three four five six seven ends"),
        (13, "nothing here repeats anything at all in any corpus truly"),
    ])
    return old, new


def _spans(df):
    return sorted((r["id"], r["span_start"], r["span_end"]) for r in df.collect())


def test_index_build_and_merge_equal_whole(spark, corpus):
    old, new = corpus
    ia = substr_index_build(old, "id", "text", k=_K)
    ib = substr_index_build(new, "id", "text", k=_K)
    whole = substr_index_build(old.unionByName(new), "id", "text", k=_K)
    merged = {r["__g__"]: r["__cnt__"] for r in substr_index_merge(ia, ib).collect()}
    want = {r["__g__"]: r["__cnt__"] for r in whole.collect()}
    assert merged == want
    rows = ia.collect()
    assert all(r["__idx_k__"] == _K for r in rows)

    ib2 = substr_index_build(old, "id", "text", k=_K + 1)
    with pytest.raises(ValueError, match="width mismatch"):
        substr_index_merge(ia, ib2)
    with pytest.raises(ValueError, match="not a k-gram count index"):
        substr_index_merge(ia, old)


@pytest.mark.parametrize("keep_first", [False, True])
def test_incremental_spans_match_batch_restriction(
    spark, corpus, tmp_path, keep_first
):
    old, new = corpus
    pth = str(tmp_path / "gidx")
    substr_index_build(old, "id", "text", k=_K).write.parquet(pth)
    index = spark.read.parquet(pth)

    inc = duplicated_spans_incremental(
        new, "id", "text", index, keep_first=keep_first
    )
    batch = duplicated_substring_spans(
        old.unionByName(new), "id", "text", k=_K, keep_first=keep_first
    ).filter(F.col("id") >= 10)
    assert _spans(inc) == _spans(batch)
    # the corpus-backed passage hits doc 10; the delta-internal repeat
    # hits 11/12 (minus the first copy under keep_first)
    hit_ids = {i for i, _, _ in _spans(inc)}
    assert 10 in hit_ids and 13 not in hit_ids
    if keep_first:
        assert 11 not in hit_ids and 12 in hit_ids
    else:
        assert {11, 12} <= hit_ids


def test_incremental_strip_matches_batch(spark, corpus, tmp_path):
    old, new = corpus
    index = substr_index_build(old, "id", "text", k=_K)
    inc = {
        r["id"]: r["text_deduped"]
        for r in strip_spans_incremental(
            new, "id", "text", index, keep_first=True
        ).collect()
    }
    batch = {
        r["id"]: r["text_deduped"]
        for r in strip_duplicated_spans(
            old.unionByName(new), "id", "text", k=_K, keep_first=True
        ).collect()
        if r["id"] >= 10
    }
    assert inc == batch
    assert _PASSAGE not in inc[10]  # the corpus passage is gone
    assert inc[13] == "nothing here repeats anything at all in any corpus truly"


def test_ingest_cycle_updates_index_with_stripped_text(spark, corpus):
    old, new = corpus
    index = substr_index_build(old, "id", "text", k=_K)
    # keep_first so doc 11 RETAINS the delta-internal passage — the
    # updated index must then hold its grams for the next cycle
    stripped, updated = incremental_substr_corpus(
        new, "id", "text", index, keep_first=True
    )
    # the updated index equals old index + index of the stripped output
    want = {
        r["__g__"]: r["__cnt__"]
        for r in substr_index_merge(
            index,
            substr_index_build(stripped, "id", "text_deduped", k=_K),
        ).collect()
    }
    got = {r["__g__"]: r["__cnt__"] for r in updated.collect()}
    assert got == want
    # a SECOND delta repeating the first delta's retained passage now
    # strips against the updated index (two-cycle chain)
    later = _mk(spark, [
        (20, "echo of one two three four five six seven in a later crawl"),
    ])
    s2, _ = incremental_substr_corpus(later, "id", "text", updated)
    out = s2.collect()[0]["text_deduped"]
    assert "one two three four five six seven" not in out


def test_k_validation_and_metadata(spark, corpus):
    old, new = corpus
    index = substr_index_build(old, "id", "text", k=_K)
    a = _spans(duplicated_spans_incremental(new, "id", "text", index, k=_K))
    b = _spans(duplicated_spans_incremental(new, "id", "text", index))
    assert a == b
    with pytest.raises(ValueError, match="contradicts"):
        duplicated_spans_incremental(new, "id", "text", index, k=_K + 2)
    with pytest.raises(ValueError, match="min_count"):
        duplicated_spans_incremental(new, "id", "text", index, min_count=1)
    with pytest.raises(ValueError, match="k must be"):
        substr_index_build(old, "id", "text", k=1)


def test_strict_lazy_requires_explicit_k(spark, corpus):
    old, new = corpus
    index = substr_index_build(old, "id", "text", k=_K)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="metadata probe"):
            duplicated_spans_incremental(new, "id", "text", index)
        df = duplicated_spans_incremental(new, "id", "text", index, k=_K)
        assert set(df.columns) == {"id", "span_start", "span_end"}
        with pytest.warns(UserWarning, match="UNVALIDATED"):
            substr_index_merge(index, index)
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")


def test_stream_ingest_substr_matches_sequential_cycles(spark, tmp_path):
    """The streaming loop with method='substr' must equal running
    incremental_substr_corpus cycle-by-cycle: same retained (stripped)
    docs, same final gram index — and the retained corpus is never
    read (no old_docs plumbing exists for this method)."""
    from pandarallel_spark.streaming import (
        read_retained_corpus,
        stream_ingest_dedup,
    )

    waves = [
        [(100, "wave one says " + _PASSAGE + " loudly today"),
         (101, "independent first wave content with nothing repeated")],
        [(200, "wave two repeats " + _PASSAGE + " again here"),  # strips
         (201, "fresh second wave material that stands alone")],
    ]
    src = str(tmp_path / "src")
    for i, w in enumerate(waves):
        _mk(spark, w).coalesce(1).write.parquet(
            src, mode="append" if i else "overwrite"
        )
    boot = str(tmp_path / "boot")
    _mk(spark, [(1, "bootstrap corpus document mentioning nothing shared")]
        ).write.parquet(boot)

    corpus_root = str(tmp_path / "corpus")
    index_root = str(tmp_path / "index")
    stream = (
        spark.readStream.schema("id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_ingest_dedup(
        stream, "id", "text", method="substr",
        corpus_root=corpus_root, index_root=index_root,
        checkpoint=str(tmp_path / "chk"), bootstrap_docs=boot,
        k=_K, keep_first=True,
    )
    q.awaitTermination(180)

    got = {
        r["id"]: r["text_deduped"]
        for r in read_retained_corpus(spark, corpus_root).collect()
    }

    # sequential reference
    index = substr_index_build(spark.read.parquet(boot), "id", "text", k=_K)
    want = {}
    for w in waves:
        stripped, index = incremental_substr_corpus(
            _mk(spark, w), "id", "text", index, keep_first=True
        )
        stripped = stripped.persist()
        for r in stripped.collect():
            want[r["id"]] = r["text_deduped"]
    assert got == want
    # the second wave's repeat of the retained passage is stripped
    assert _PASSAGE not in got[200] and _PASSAGE in got[100]


def test_stream_ingest_substr_validation(spark, tmp_path):
    from pandarallel_spark.streaming import stream_ingest_dedup

    src = tmp_path / "vsrc"
    src.mkdir()
    stream = spark.readStream.schema("id long, text string").parquet(str(src))
    common = dict(
        corpus_root=str(tmp_path / "c"), index_root=str(tmp_path / "i"),
        checkpoint=str(tmp_path / "kk"),
    )
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(
            stream, "id", "text", method="substr", n=3, **common
        )
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(
            stream, "id", "text", method="substr", verify="exact", **common
        )
    with pytest.raises(ValueError, match="does not use"):
        stream_ingest_dedup(stream, "id", "text", k=8, **common)
