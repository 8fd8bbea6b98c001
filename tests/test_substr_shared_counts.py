"""Focused tests for the r14 shared-counts wiring of the
dedup_substring_spans family row: the batch kind's corpus-wide
duplicated-gram set derived from even-half index + odd-half delta
counts (counts are additive over a partition of the corpus), and the
_sh/_delta_counts injection into duplicated_spans_incremental. The
contract is bit-identical spans versus the plain operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators._memo import truncate_lineage
from pandarallel_spark.operators.dedup import (
    _shingle_pos_rows,
    duplicated_substring_spans,
)
from pandarallel_spark.operators.incremental_substr import (
    duplicated_spans_incremental,
    substr_index_build,
)

_K = 3


def _corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rep = "the quick brown fox jumps over the lazy dog"
    docs = [
        (0, f"{rep} one {base}"),
        (1, f"{rep} two {base} extra tokens here"),
        (2, f"unique words only nothing shared at all {rep}"),
        (3, "totally disjoint content with no repeats whatsoever"),
        (4, f"{base} tail piece"),
        (5, rep),  # whole doc duplicated elsewhere
        (6, "short"),  # < k tokens: no shingles
    ]
    return spark.createDataFrame(docs, "doc_id bigint, text string")


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"]) for r in df.collect()
    )


def test_derived_dup_grams_match_plain_batch(spark):
    docs = _corpus(spark)
    plain = _spans(
        duplicated_substring_spans(docs, "doc_id", "text", k=_K)
    )
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    index = substr_index_build(even, "doc_id", "text", k=_K)
    odd_counts = (
        _shingle_pos_rows(odd, "doc_id", "text", _K)
        .groupBy("__g__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )
    derived_grams = (
        index.select("__g__", "__cnt__")
        .unionByName(odd_counts)
        .groupBy("__g__")
        .agg(F.sum("__cnt__").alias("__c__"))
        .filter(F.col("__c__") >= 2)
        .select("__g__")
    )
    derived = _spans(
        duplicated_substring_spans(
            docs, "doc_id", "text", k=_K, _dup_grams=derived_grams
        )
    )
    assert derived == plain
    assert plain  # non-trivial corpus: some spans exist


def test_injected_sh_and_counts_match_plain_incremental(spark):
    docs = _corpus(spark)
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    index = substr_index_build(even, "doc_id", "text", k=_K)
    plain = _spans(
        duplicated_spans_incremental(odd, "doc_id", "text", index, _k=_K)
    )
    sh_odd = truncate_lineage(
        _shingle_pos_rows(odd, "doc_id", "text", _K), eager=False
    )
    odd_counts = sh_odd.groupBy("__g__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    )
    injected = _spans(
        duplicated_spans_incremental(
            odd, "doc_id", "text", index,
            _k=_K, _sh=sh_odd, _delta_counts=odd_counts,
        )
    )
    assert injected == plain
    assert plain


def test_dup_grams_injection_refuses_keep_first(spark):
    docs = _corpus(spark)
    grams = spark.createDataFrame([("x",)], "__g__ string")
    with pytest.raises(ValueError, match="keep_first"):
        duplicated_substring_spans(
            docs, "doc_id", "text", k=_K, keep_first=True, _dup_grams=grams
        )


def test_keep_first_path_unchanged(spark):
    # the keep_first branch still runs the in-function aggregate with
    # the first-occurrence struct — regression guard that the r14
    # restructuring (conditional __dfirst__) did not change it
    docs = _corpus(spark)
    out = _spans(
        duplicated_substring_spans(
            docs, "doc_id", "text", k=_K, keep_first=True
        )
    )
    full = _spans(duplicated_substring_spans(docs, "doc_id", "text", k=_K))
    # keep_first strips strictly fewer positions than strip-all
    assert set(d for d, _, _ in out) <= set(d for d, _, _ in full)
    assert len(out) < len(full)
