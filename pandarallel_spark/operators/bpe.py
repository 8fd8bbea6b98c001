"""BPE tokenizer training and encoding over a corpus (SURVEY.md §2.3).

``text.bpe_tokens`` gives the GPT-2-style PRETOKENS (regex word split);
this module completes the tokenizer story: learn the byte-pair merge
table FROM the corpus and encode with it, the Sennrich et al. 2016
algorithm (arXiv:1508.07909) re-expressed for Spark's execution model.

The scale split mirrors how production tokenizer trainers actually
work (HuggingFace tokenizers, SentencePiece): BPE training never needs
the corpus — it needs the WORD HISTOGRAM, which is corpus-agnostic in
size (vocabulary grows ~O(corpus^0.5), Heaps' law). So:

- ``word_histogram`` — the only corpus-sized work: one scan + one
  aggregation (map-side combined) over the pretokens. At 100 TB this
  is the distributed step, and it is embarrassingly parallel.
- ``train_bpe`` — exact, deterministic merge learning over the
  histogram on the driver, bounded by ``max_words`` (top words by
  frequency; the dropped tail's mass fraction is computed and WARNED
  about — at realistic caps it is well under 0.1%). Driver-side by
  design, like the IVF centroid trainer: the histogram is small, the
  algorithm is inherently sequential (merge i+1 depends on merge i),
  and a per-merge distributed aggregation would pay vocab_size
  shuffles for work a dict does in microseconds.
- ``bpe_encode`` — distributed again: an Arrow-batched pandas UDF
  applying the learned merge ranks per pretoken, with a size-capped
  per-worker word cache (Zipf's law makes the hit rate ~99%+). Pure
  scan projection, no shuffle.

Determinism contract: ties on pair frequency break by lexicographic
pair order, so two trainings over the same histogram produce the SAME
merge list on any engine — and the differential pytest pins the
incremental trainer against a naive recount-everything reference.

The histogram is also the tokenizer's INGEST artifact: it merges by
summing counts (``word_histogram_merge`` — merge == whole-build, like
the dedup/ANN index merges), so a growing corpus persists its
histogram once, each delta pays one aggregate over its own text, and
``train_bpe_from_histogram`` retrains from the merged artifact without
re-scanning anything.
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pandarallel_spark.operators._memo import (
    eager_build_guard,
    truncate_lineage,
)
from pandarallel_spark.operators.text import BPE_PATTERN as _RAW_PATTERN
from pandarallel_spark.operators.text import bpe_tokens

END_OF_WORD = "</w>"


def word_histogram(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """``(word, count)`` over the corpus's BPE pretokens — ONE scan,
    ONE aggregation (map-side partials do most of the collapsing; the
    shuffle carries distinct words per partition, not tokens). This is
    the only corpus-sized step of tokenizer training."""
    toks = bpe_tokens(F.col(text_col)) if lowercase else F.regexp_extract_all(
        F.col(text_col), F.lit(_RAW_PATTERN), 0
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _check_histogram(hist_df: DataFrame, op: str) -> None:
    for c in ("word", "count"):
        if c not in hist_df.columns:
            raise ValueError(
                f"{op}: not a word histogram — missing column {c!r} "
                "(build one with word_histogram)"
            )


def word_histogram_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two word histograms, summing counts —
    ``merge(word_histogram(A), word_histogram(B))`` row-for-row equals
    ``word_histogram(A ∪ B)``. This is the tokenizer-training ingest
    twin: the histogram is the persistable artifact (vocabulary-sized,
    Heaps' law — tens of MB for a 100 TB web corpus), each delta pays
    ONE histogram aggregate over its own text, and
    :func:`train_bpe_from_histogram` retrains from the merged artifact
    without ever re-scanning the corpus. Same shape as
    ``incremental.minhash_index_merge`` / ``substr_index_merge``, with
    no metadata to validate — a histogram has no build-time dials (the
    pretokenizer regex is fixed; ``lowercase`` must match across
    builds, which the caller owns like any normalization step)."""
    _check_histogram(a, "word_histogram_merge")
    _check_histogram(b, "word_histogram_merge")
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.sum("count").alias("count"))
    )


def _pairs_of(sym: tuple) -> list:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    out = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_from_histogram(
    hist: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Exact BPE over a (word, count) histogram with INCREMENTAL pair
    bookkeeping — each merge touches only the words containing the
    merged pair (an inverted index), not the whole vocabulary; the
    naive recount-per-merge form is the test reference. Ties break by
    (count desc, pair lexicographic asc): deterministic."""
    words = [tuple(w) + (END_OF_WORD,) for w, _ in hist]
    freqs = [int(c) for _, c in hist]
    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, sym in enumerate(words):
        for p in _pairs_of(sym):
            pair_counts[p] = pair_counts.get(p, 0) + freqs[wi]
            pair_words.setdefault(p, set()).add(wi)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        for wi in sorted(pair_words.get(pair, ())):
            sym = words[wi]
            if pair not in _pairs_of(sym):
                continue
            f = freqs[wi]
            for p in _pairs_of(sym):
                pair_counts[p] -= f
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
            new = _merge_word(sym, pair)
            words[wi] = new
            for p in _pairs_of(new):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop(pair, None)
        pair_words.pop(pair, None)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    max_words: int = 1_000_000,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus; returns the
    ordered merge list (feed it to :func:`bpe_encode`).

    The corpus-sized work is :func:`word_histogram` (one scan, one
    shuffle); training itself runs on the driver over the top
    ``max_words`` words by frequency (ties to lexicographic order for
    a deterministic histogram). When the cap truncates, the dropped
    tail's TOKEN-MASS fraction is computed exactly (one extra scalar
    aggregate over the already-shuffled histogram) and a ``UserWarning``
    reports it — by Zipf's law a 1M-word cap on a web corpus drops
    well under 0.1% of occurrences, and BPE statistics are mass-
    weighted, so the learned merges are insensitive to the tail.

    Eager by design (the histogram collect) and strictLazy-gated.
    """
    # validate BEFORE building the histogram plan: under
    # reliableCheckpoint the truncation below is eager (a full corpus
    # scan + checkpoint write), which must never run for arguments the
    # trainer will reject anyway
    if num_merges < 1:
        raise ValueError(f"num_merges must be ≥ 1, got {num_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be ≥ 1, got {max_words}")
    # lineage-truncated so the truncation-mass aggregate inside the
    # histogram trainer reads the materialized histogram blocks instead
    # of re-running the corpus explode+groupBy as a second full scan
    # (review finding r11); the truncation must happen HERE, where the
    # histogram is a computed plan — train_bpe_from_histogram also takes
    # persisted parquet histograms, for which a checkpoint would only
    # copy cheap scan output
    return train_bpe_from_histogram(
        truncate_lineage(
            word_histogram(df, text_col, lowercase=lowercase), eager=False
        ),
        num_merges,
        max_words=max_words,
        _op="train_bpe",
    )


def train_bpe_from_histogram(
    hist_df: DataFrame,
    num_merges: int,
    max_words: int = 1_000_000,
    _op: str = "train_bpe_from_histogram",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a ``(word, count)``
    histogram DataFrame — :func:`word_histogram` output, reloaded from
    parquet and/or combined with :func:`word_histogram_merge`. This is
    the ingest-loop retraining path: at 100 TB the corpus is scanned
    once per delta (its histogram), and every retrain reads only the
    merged vocabulary-sized artifact. Identical semantics to
    :func:`train_bpe` (same cap, same truncation-mass warning, same
    deterministic tie-break), because :func:`train_bpe` IS this
    function over a freshly aggregated histogram."""
    if num_merges < 1:
        raise ValueError(f"num_merges must be ≥ 1, got {num_merges}")
    if max_words < 1:
        raise ValueError(f"max_words must be ≥ 1, got {max_words}")
    _check_histogram(hist_df, _op)
    eager_build_guard(
        hist_df.sparkSession,
        f"{_op} histogram collect (bounded by max_words)",
        "Collect a word histogram yourself and use the driver trainer "
        "outside strict-lazy scope.",
    )
    top = (
        hist_df.orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words + 1)
        .collect()
    )
    if len(top) > max_words:
        top = top[:max_words]
        totals = hist_df.agg(
            F.sum("count").alias("all"),
        ).collect()[0]
        kept = sum(r["count"] for r in top)
        dropped = 1.0 - kept / float(totals["all"])
        warnings.warn(
            f"{_op}: histogram truncated to the top {max_words} words "
            f"— the dropped tail holds {dropped:.4%} of token occurrences; "
            "raise max_words if that mass matters for your vocabulary",
            stacklevel=2,
        )
    hist = [(r["word"], r["count"]) for r in top]
    return _train_from_histogram(hist, num_merges)


_ENC_CACHE_CAP = 500_000


def _encoder(merges: list[tuple[str, str]]):
    """A word → pieces function applying merges by RANK (lowest-rank
    mergeable pair first — the standard BPE inference rule, which
    reproduces training order exactly), with a per-worker cache; Zipf
    makes the distinct-word working set small, and a size cap bounds
    the pathological case (high-cardinality pretokens like URLs or
    hashes) by flushing rather than growing without limit."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cache: dict = {}

    def encode(word: str) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        if len(cache) >= _ENC_CACHE_CAP:
            cache.clear()
        sym = tuple(word) + (END_OF_WORD,)
        while len(sym) > 1:
            best = min(
                (p for p in _pairs_of(sym) if p in ranks),
                key=lambda p: ranks[p],
                default=None,
            )
            if best is None:
                break
            sym = _merge_word(sym, best)
        out = list(sym)
        cache[word] = out
        return out

    return encode


def bpe_encode(
    col: Column | str, merges: list[tuple[str, str]], lowercase: bool = True
) -> Column:
    """Encode a TEXT column into BPE pieces (``array<string>``, the
    word-final piece suffixed ``</w>``): pretokenize JVM-side
    (``text.bpe_tokens``'s regex), then apply the merge ranks in an
    Arrow-batched pandas UDF — a pure scan projection (no shuffle),
    with the merge table shipped once per executor in the UDF closure
    and a per-worker word cache in front of the merge loop."""
    # built OUTSIDE the UDF body: the closure (merge ranks + cache dict)
    # deserializes once per python worker, so the cache persists across
    # Arrow batches within a worker instead of resetting per batch
    enc = _encoder([tuple(p) for p in merges])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        # ws arrives as a numpy array (Arrow), whose truthiness is
        # ambiguous — test None explicitly
        return words.apply(
            lambda ws: []
            if ws is None
            else [piece for w in ws for piece in enc(w)]
        )

    toks = bpe_tokens(col) if lowercase else F.regexp_extract_all(
        F.col(col) if isinstance(col, str) else col, F.lit(_RAW_PATTERN), 0
    )
    return _encode(toks)


def save_bpe_merges(
    spark, merges: list[tuple[str, str]], path: str, lowercase: bool = True
) -> None:
    """Persist a trained merge table — the tokenizer's SECOND artifact
    next to the word histogram: the histogram lets you RETRAIN without
    re-scanning; the saved merges let every later session ENCODE
    without retraining at all (ship the path to the encode jobs, not a
    Python object). One vocabulary-sized parquet of ``(rank, left,
    right)`` plus the ``lowercase`` pretokenization flag stamped on
    every row — :func:`load_bpe_merges` validates it against the
    caller's intent the way the ingest loop validates its sidecar
    (encoding with the wrong pretokenization silently produces
    different pieces, never an error)."""
    if not merges:
        raise ValueError("save_bpe_merges: empty merge table")
    df = spark.createDataFrame(
        [(i, a, b, bool(lowercase)) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string, lowercase boolean",
    )
    df.coalesce(1).write.mode("error").parquet(path)


def load_bpe_merges(
    spark, path: str, lowercase: bool = True
) -> list[tuple[str, str]]:
    """Reload a merge table saved by :func:`save_bpe_merges`, rank
    order restored exactly; raises when the stored ``lowercase``
    pretokenization flag disagrees with the caller's (pass the setting
    you will hand to ``bpe_encode``). Eager (a vocabulary-sized
    bounded collect), strictLazy-gated."""
    from pandarallel_spark.operators._memo import eager_build_guard

    eager_build_guard(
        spark,
        "load_bpe_merges table read (vocabulary-sized bounded collect)",
        "Load the merge table outside strict-lazy scope.",
    )
    df = spark.read.parquet(path)
    for c in ("rank", "left", "right", "lowercase"):
        if c not in df.columns:
            raise ValueError(
                f"load_bpe_merges: {path!r} is not a saved merge table — "
                f"missing column {c!r} (write one with save_bpe_merges)"
            )
    rows = df.orderBy("rank").collect()
    if not rows:
        raise ValueError(f"load_bpe_merges: the table at {path!r} is empty")
    stored = bool(rows[0]["lowercase"])
    if stored != bool(lowercase):
        raise ValueError(
            f"load_bpe_merges: the table was trained with "
            f"lowercase={stored} but lowercase={lowercase} was requested "
            "— encoding with mismatched pretokenization silently changes "
            "every piece; pass the stored setting"
        )
    return [(r["left"], r["right"]) for r in rows]
