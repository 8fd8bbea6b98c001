"""Continuous tokenizer-histogram ingest (streaming/ingest_bpe.py):
the BPE artifact's streaming twin. Load-bearing properties: the
streamed histogram equals word_histogram over the unioned corpus
row-for-row (and therefore retraining from it equals training over the
union), restart is a no-op, compaction keeps reader results identical,
and the lowercase pretokenization dial is stamped + enforced."""

import pytest

from pandarallel_spark.operators.bpe import (
    train_bpe,
    train_bpe_from_histogram,
    word_histogram,
)
from pandarallel_spark.streaming import (
    compact_bpe_deltas,
    read_word_histogram,
    stream_ingest_bpe,
    write_base_histogram,
)

_BASE = [
    "low lower lowest in the low house",
    "the new newest news is new",
]
_WAVES = [
    ["low low lower than the lowest ever", "a new low for the news"],
    ["the newest house is the lowest house"],
    ["news of the new lower house"],
]


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def _run_stream(spark, tmp_path, root, chk, lowercase=True):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src"))
    )
    q = stream_ingest_bpe(
        stream, "text", hist_root=root, checkpoint=chk, lowercase=lowercase
    )
    q.awaitTermination(180)


def test_stream_histogram_equals_union_and_retrain_matches(spark, tmp_path):
    base_docs = _docs(spark, _BASE)
    root = str(tmp_path / "hist")
    chk = str(tmp_path / "chk")
    write_base_histogram(
        spark, root, word_histogram(base_docs, "text"), lowercase=True
    )

    src = str(tmp_path / "src")
    union = base_docs
    for i, wave in enumerate(_WAVES):
        f = _docs(spark, wave, start=100 * (i + 1))
        f.coalesce(1).write.parquet(src, mode="append" if i else "overwrite")
        union = union.unionByName(f)

    _run_stream(spark, tmp_path, root, chk)

    got = {
        r["word"]: r["count"]
        for r in read_word_histogram(spark, root).collect()
    }
    want = {
        r["word"]: r["count"]
        for r in word_histogram(union, "text").collect()
    }
    assert got == want

    # retrain from the streamed artifact == train over the union corpus
    m1 = train_bpe_from_histogram(read_word_histogram(spark, root), 12)
    m2 = train_bpe(union, "text", 12)
    assert m1 == m2

    # restart over the same checkpoint: no new batches, identical rows
    _run_stream(spark, tmp_path, root, chk)
    again = {
        r["word"]: r["count"]
        for r in read_word_histogram(spark, root).collect()
    }
    assert again == got

    # compaction folds committed dirs below the newest; readers
    # identical (deltas are additive partials — the reader sums)
    assert compact_bpe_deltas(spark, root) is not None
    after = {
        r["word"]: r["count"]
        for r in read_word_histogram(spark, root).collect()
    }
    assert after == got


def test_lowercase_stamp_is_enforced(spark, tmp_path):
    root = str(tmp_path / "hist2")
    chk = str(tmp_path / "chk2")
    src = str(tmp_path / "src")
    _docs(spark, ["Mixed Case Words"]).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    q = stream_ingest_bpe(
        stream, "text", hist_root=root, checkpoint=chk, lowercase=True
    )
    q.awaitTermination(120)
    # a resume with the OTHER setting refuses at loop start
    stream2 = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    with pytest.raises(ValueError, match="lowercase=True"):
        stream_ingest_bpe(
            stream2, "text", hist_root=root,
            checkpoint=str(tmp_path / "chk3"), lowercase=False,
        )
    # bootstrap helper stamps too
    root3 = str(tmp_path / "hist3")
    write_base_histogram(
        spark, root3,
        word_histogram(_docs(spark, ["a b"]), "text", lowercase=False),
        lowercase=False,
    )
    stream3 = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    with pytest.raises(ValueError, match="lowercase=False"):
        stream_ingest_bpe(
            stream3, "text", hist_root=root3,
            checkpoint=str(tmp_path / "chk4"), lowercase=True,
        )


def test_bpe_loop_strictlazy_and_base_stamp_protection(spark, tmp_path):
    """Review-finding pins (r12): the loop's eager stamp recovery is
    strictLazy-gated like the sibling loops, and write_base_histogram
    refuses to flip an existing stamp instead of clobbering it."""
    src = str(tmp_path / "src")
    _docs(spark, ["a b c"]).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    spark.conf.set("spark.pandarallel_spark.strictLazy", "true")
    try:
        with pytest.raises(RuntimeError, match="stream_ingest_bpe"):
            stream_ingest_bpe(
                stream, "text", hist_root=str(tmp_path / "h"),
                checkpoint=str(tmp_path / "c"),
            )
    finally:
        spark.conf.set("spark.pandarallel_spark.strictLazy", "false")

    # a root stamped by a loop run refuses a mismatching base bootstrap
    root = str(tmp_path / "h2")
    q = stream_ingest_bpe(
        stream, "text", hist_root=root, checkpoint=str(tmp_path / "c2"),
        lowercase=True,
    )
    q.awaitTermination(120)
    with pytest.raises(ValueError, match="already stamped lowercase=True"):
        write_base_histogram(
            spark, root,
            word_histogram(_docs(spark, ["x Y"]), "text", lowercase=False),
            lowercase=False,
        )
