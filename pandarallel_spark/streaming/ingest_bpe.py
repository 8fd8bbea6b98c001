"""Continuous tokenizer-corpus ingest: a Structured Streaming loop
around the persisted word histogram — the artifact
``operators/bpe.py`` trains from. This closes the last ingest
asymmetry: dedup, exact-substring, embedding, IVF-Flat, and IVF-PQ all
have streaming loops; the tokenizer's histogram could only be merged
batch-wise (``word_histogram_merge``).

Layout:

- ``{hist_root}/base/``      — optional bootstrap histogram (the
  corpus already indexed when the loop starts)
- ``{hist_root}/delta/b={id}/`` — one ``(word, count)`` parquet dir per
  micro-batch (idempotent overwrite; readers trust only
  ``_SUCCESS``-committed dirs — the shared replay protocol)

The read side (:func:`read_word_histogram`) SUMS across base + deltas,
so delta dirs are plain additive partials: compaction
(:func:`compact_bpe_deltas`) can concatenate rows without re-merging —
the reader's groupBy does the arithmetic — and a replay overwriting
its own dir can never double-count. Retraining is
``train_bpe_from_histogram(read_word_histogram(spark, root))``: each
delta pays ONE histogram aggregate over its own text, the retrain
reads only the vocabulary-sized artifact (Heaps' law: tens of MB for
a 100 TB corpus), and the raw corpus is never re-scanned.

``lowercase`` must match across the bootstrap and every loop run (it
changes the pretokens, like any normalization step) — the loop stamps
it into a one-row ``meta/`` sidecar at first start and REFUSES a
mismatching resume, the same loud-metadata discipline as the dedup
index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandarallel_spark.streaming.ingest import (
    _committed_batches,
    _compact_numbered_dirs,
    _fs,
    _refuse_pending_compaction,
)
from pandarallel_spark.streaming.ingest_ann import _delta_ingest_loop


def _hist_meta_path(hist_root: str) -> str:
    return f"{hist_root}/meta"


def _read_lowercase_meta(spark: SparkSession, hist_root: str) -> bool | None:
    jvm, fs, _ = _fs(spark, hist_root)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(_hist_meta_path(hist_root))):
        return None
    row = spark.read.parquet(_hist_meta_path(hist_root)).limit(1).collect()
    return bool(row[0]["__bpe_lowercase__"]) if row else None


def stream_ingest_bpe(
    stream: DataFrame,
    text_col: str,
    *,
    hist_root: str,
    checkpoint: str,
    lowercase: bool = True,
    trigger_available_now: bool = True,
):
    """Run the tokenizer-histogram ingest loop over ``stream``; returns
    the started ``StreamingQuery``. Each micro-batch pays exactly one
    ``word_histogram`` aggregate over its own rows (map-side combined —
    the shuffle carries the batch's distinct words) and one idempotent
    overwrite of ``delta/b={batchId}``; empty batches are skipped and
    the reset-checkpoint stale-dir refusal applies as in every other
    loop. The ``lowercase`` pretokenization dial is stamped into a
    one-row ``meta/`` sidecar on first start; a resume with the other
    setting refuses loudly (mixed-case and lowercased pretokens in one
    histogram would silently split every word's count in two)."""
    from pandarallel_spark.operators._memo import eager_build_guard
    from pandarallel_spark.operators.bpe import word_histogram

    spark = stream.sparkSession
    # loop start reads (and on first start writes) the one-row sidecar —
    # eager work the strictLazy contract forbids silently, same as the
    # sibling PQ loop's metadata recovery (review finding r12)
    eager_build_guard(
        spark,
        "stream_ingest_bpe lowercase-stamp recovery (one-row bounded "
        "collect + first-start sidecar write)",
        "The ingest loop is eager by design — run it from a session "
        "that permits build-time jobs.",
    )
    stamped = _read_lowercase_meta(spark, hist_root)
    if stamped is None:
        spark.range(1).select(
            F.lit(bool(lowercase)).alias("__bpe_lowercase__")
        ).write.mode("overwrite").parquet(_hist_meta_path(hist_root))
    elif stamped != bool(lowercase):
        raise ValueError(
            f"stream_ingest_bpe: this histogram was built with "
            f"lowercase={stamped} but the loop was started with "
            f"lowercase={lowercase} — mixed pretokenization would split "
            "every word's count in two; resume with the stamped setting "
            "or start a fresh root"
        )

    def prepare(batch_df: DataFrame) -> DataFrame:
        return word_histogram(batch_df, text_col, lowercase=lowercase)

    return _delta_ingest_loop(
        stream,
        index_root=hist_root,
        checkpoint=checkpoint,
        tool="compact_bpe_deltas",
        prepare=prepare,
        trigger_available_now=trigger_available_now,
        partition_by=None,  # a histogram has no probed-list layout
    )


def read_word_histogram(
    spark: SparkSession, hist_root: str, include_base: bool = True
) -> DataFrame | None:
    """The merged ``(word, count)`` histogram as of the last COMMITTED
    batches: base (when present and requested) + ``_SUCCESS``-carrying
    delta dirs, summed per word — row-for-row what
    ``word_histogram_merge`` over the same parts produces, so
    ``train_bpe_from_histogram(read_word_histogram(spark, root))`` is
    the retrain. None when nothing exists yet. Refuses while a delta
    compaction manifest is pending."""
    droot = f"{hist_root}/delta"
    _refuse_pending_compaction(spark, droot, "compact_bpe_deltas", "reading")
    jvm, fs, _ = _fs(spark, hist_root)
    parts = []
    base = f"{hist_root}/base"
    if include_base and fs.exists(jvm.org.apache.hadoop.fs.Path(base)):
        parts.append(base)
    parts += [
        f"{droot}/b={b}" for b in _committed_batches(spark, droot, "b=")
    ]
    if not parts:
        return None
    return (
        spark.read.parquet(*parts)
        .groupBy("word")
        .agg(F.sum("count").alias("count"))
    )


def write_base_histogram(
    spark: SparkSession, hist_root: str, hist: DataFrame, lowercase: bool
) -> None:
    """Bootstrap a histogram root from an existing corpus's
    ``word_histogram`` output: writes ``base/`` and stamps the
    ``lowercase`` sidecar the loop validates against. An EXISTING stamp
    is validated, never clobbered — a root that already holds loop
    deltas under one pretokenization must not silently flip to the
    other (review finding r12: the overwrite corrupted the very stamp
    the loop enforces)."""
    from pandarallel_spark.operators.bpe import _check_histogram

    _check_histogram(hist, "write_base_histogram")
    stamped = _read_lowercase_meta(spark, hist_root)
    if stamped is not None and stamped != bool(lowercase):
        raise ValueError(
            f"write_base_histogram: {hist_root!r} is already stamped "
            f"lowercase={stamped} (it holds loop output under that "
            f"pretokenization) but the base was built with "
            f"lowercase={lowercase} — rebuild the base to match, or "
            "bootstrap a fresh root"
        )
    hist.write.mode("error").parquet(f"{hist_root}/base")
    if stamped is None:
        spark.range(1).select(
            F.lit(bool(lowercase)).alias("__bpe_lowercase__")
        ).write.mode("overwrite").parquet(_hist_meta_path(hist_root))


def compact_bpe_deltas(spark: SparkSession, hist_root: str) -> int | None:
    """Fold committed delta dirs strictly below the newest into one —
    the shared tmp-then-manifest crash protocol. Deltas are ADDITIVE
    partials (the reader sums), so concatenating their rows is a
    correct fold; the surviving dir simply holds several partial rows
    per hot word until the next read's groupBy."""
    return _compact_numbered_dirs(spark, f"{hist_root}/delta", "b=")
