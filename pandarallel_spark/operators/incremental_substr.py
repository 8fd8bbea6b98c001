"""Incremental exact-substring dedup against a persistable k-gram
index — the ExactSubstr ingest twin, completing the incremental
trilogy next to the MinHash (``incremental.py``) and embedding
(``incremental_embedding.py``) paths.

``duplicated_substring_spans`` answers "which ≥ k-token passages
repeat WITHIN this corpus" (Lee et al. arXiv:2107.06499, distributed
k-token-anchor formulation); an ingest loop instead asks "which
passages of these NEW documents already exist in the retained corpus
(or repeat within the delta)" — and the corpus side must come from a
precomputed artifact, not a re-shingle.

The artifact is the **k-gram count index**: one row per DISTINCT
k-token shingle in the retained corpus —

    (__g__, __cnt__, __idx_k__)

md5 gram hash, corpus-wide occurrence count, and the constant shingle
width. Size: ~16 bytes per distinct gram — the same order as the
suffix array the single-node formulation builds (8 bytes/token), and
like it, built once. Counts (not a distinct set) make ``min_count``
a QUERY-time dial: a delta position is duplicated when corpus count +
delta count reaches it — exactly the batch criterion over OLD ∪ NEW.

The delta query touches the DELTA fully (one zero-shuffle positional
shingle pass + one gram-count aggregate) and the INDEX through one
gram equi-join sized by the DELTA's distinct grams. At 100 TB persist
the index BUCKETED on ``__g__`` (``sources.write_bucketed``): the
join then shuffles only the delta side, every cycle.

Policy is retained-content-wins, the ingest trilogy's shared rule:
spans are stripped from NEW documents only; the corpus is immutable.
``keep_first=True`` keeps each purely-delta-internal gram's first
delta occurrence (min (id, pos)); grams already in the corpus strip
ALL their delta occurrences — their first occurrence lives in the
retained corpus by construction. With old ids below new ids this is
bit-for-bit the batch operator's ``keep_first`` over OLD ∪ NEW
restricted to the new docs (differential pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pandarallel_spark.operators._memo import (
    eager_build_guard,
    truncate_lineage,
)
from pandarallel_spark.operators.dedup import (
    _cut_spans,
    _shingle_pos_rows,
    _spans_from_seeds,
)

_SUBSTR_META = ("__idx_k__",)


def substr_index_build(
    df: DataFrame, id_col: str, text_col: str, k: int = 20
) -> DataFrame:
    """Build the k-gram count index for a (retained) corpus: one scan,
    one map-side-combined aggregate — a hot boilerplate gram collapses
    to partial counts before the shuffle, so it costs a long-tail
    reduce key, not memory. Persist with ``.write`` (bucket on
    ``__g__`` for shuffle-free delta joins) and reload for the next
    cycle; downstream checks the embedded ``k`` instead of trusting
    the caller to remember it."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2 tokens, got {k}")
    sh = _shingle_pos_rows(df, id_col, text_col, k)
    return sh.groupBy("__g__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    ).select(
        "__g__", "__cnt__", F.lit(k).cast("int").alias("__idx_k__")
    )


def _check_substr_index(index: DataFrame) -> None:
    for c in (*_SUBSTR_META, "__g__", "__cnt__"):
        if c not in index.columns:
            raise ValueError(
                f"not a k-gram count index: missing column {c!r} "
                "(build one with substr_index_build)"
            )


def _substr_index_k(index: DataFrame) -> int | None:
    _check_substr_index(index)
    eager_build_guard(
        index.sparkSession,
        "substring index metadata probe (one-row bounded collect)",
        "Pass k= explicitly to skip the probe.",
    )
    row = index.select("__idx_k__").limit(1).collect()
    return int(row[0]["__idx_k__"]) if row else None


def _resolve_substr_k(index: DataFrame, k: int | None) -> int:
    """Explicit ``k`` wins (validated against the metadata whenever the
    probe is permitted — a delta shingled at a different width silently
    matches nothing); otherwise the index's embedded value; the build
    default (20) only for an EMPTY index."""
    if k is not None:
        _check_substr_index(index)
        try:
            meta = _substr_index_k(index)
        except RuntimeError:  # strict-lazy: trust the explicit param
            return k
        if meta is not None and meta != k:
            raise ValueError(
                f"explicit k={k} contradicts the index's embedded width "
                f"{meta} — an index only matches deltas shingled exactly "
                "the way it was built"
            )
        return k
    meta = _substr_index_k(index)
    return meta if meta is not None else 20


def substr_index_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two indexes built at the same ``k``, summing counts —
    ``merge(build(A), build(B))`` row-for-row equals ``build(A ∪ B)``.
    A width mismatch raises up front (one-row probes; under strictLazy
    the check degrades to a loud warning, like the sibling merges)."""
    _check_substr_index(a)
    _check_substr_index(b)
    try:
        ka, kb = _substr_index_k(a), _substr_index_k(b)
    except RuntimeError:
        import warnings

        warnings.warn(
            "substr_index_merge under strictLazy cannot read the "
            "indexes' embedded k metadata — the merge is UNVALIDATED; "
            "merging indexes built at different shingle widths silently "
            "corrupts the result. Verify compatibility out-of-band or "
            "merge outside strict-lazy scope.",
            stacklevel=2,
        )
        return _substr_merge_unchecked(a, b)
    if ka is not None and kb is not None and ka != kb:
        raise ValueError(
            f"index width mismatch: k {ka} vs {kb} — indexes must be "
            "built at identical shingle widths to be mergeable"
        )
    return _substr_merge_unchecked(a, b)


def _substr_merge_unchecked(a: DataFrame, b: DataFrame) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy("__g__")
        .agg(
            F.sum("__cnt__").alias("__cnt__"),
            F.first("__idx_k__").alias("__idx_k__"),
        )
        .select("__g__", "__cnt__", "__idx_k__")
    )


def duplicated_spans_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    k: int | None = None,
    min_count: int = 2,
    keep_first: bool = False,
    _k: int | None = None,
    _sh: DataFrame | None = None,
    _delta_counts: DataFrame | None = None,
) -> DataFrame:
    """Duplicated spans of the DELTA against the indexed corpus and
    itself: maximal token runs of NEW documents covered by k-grams
    whose corpus count + delta count ≥ ``min_count`` — exactly the
    batch criterion over OLD ∪ NEW, restricted to the new docs,
    without re-shingling the corpus. Output (id, span_start, span_end)
    like the batch operator; feed to :func:`strip_spans_incremental`.

    ``keep_first=True``: a gram absent from the corpus keeps its first
    delta occurrence (min (id, pos)); a gram the corpus already holds
    strips ALL delta occurrences — its first occurrence is retained
    content. Scale shape: the delta pays one positional shingle pass
    (zero-shuffle) + one gram-count aggregate; the index pays ONE gram
    equi-join sized by the delta's distinct grams (bucket the
    persisted index on ``__g__`` and only the delta shuffles).

    ``_sh`` / ``_delta_counts`` (internal — the workload family row):
    an already-lineage-truncated positional shingle table of
    ``new_df`` at width ``k``, and/or a precomputed
    ``(__g__, __cnt__)`` count table over it, so a caller running
    several consumers of the same delta (here: the incr kind AND the
    batch kind's derived corpus counts) pays the shingle pass and the
    count aggregate once. ``_delta_counts`` is only consulted when
    ``keep_first`` is False (the first-occurrence struct is not in a
    plain count table). Caller-asserted equivalence.
    """
    if min_count < 2:
        raise ValueError(f"min_count must be ≥ 2, got {min_count}")
    k = _k if _k is not None else _resolve_substr_k(index, k)
    sh = _sh if _sh is not None else truncate_lineage(
        _shingle_pos_rows(new_df, id_col, text_col, k), eager=False
    )
    if keep_first:
        delta = sh.groupBy("__g__").agg(
            F.count(F.lit(1)).alias("__dc__"),
            F.min(F.struct("__id__", "__pos__")).alias("__dfirst__"),
        )
        info_cols = ["__g__", "__oc__", "__dfirst__"]
    else:
        # __dfirst__ is only consumed by the keep_first filter; Catalyst
        # pruned it here anyway, so skipping it is plan-neutral and lets
        # an injected plain count table slot in
        delta = (
            _delta_counts.select("__g__", F.col("__cnt__").alias("__dc__"))
            if _delta_counts is not None
            else sh.groupBy("__g__").agg(F.count(F.lit(1)).alias("__dc__"))
        )
        info_cols = ["__g__", "__oc__"]
    idx = index.select("__g__", F.col("__cnt__").alias("__oc__"))
    info = (
        delta.join(idx, "__g__", "left")
        .withColumn("__oc__", F.coalesce(F.col("__oc__"), F.lit(0)))
        .filter(F.col("__oc__") + F.col("__dc__") >= min_count)
        .select(*info_cols)
    )
    seeds = sh.join(info, "__g__")
    if keep_first:
        seeds = seeds.filter(
            (F.col("__oc__") > 0)
            | (F.struct("__id__", "__pos__") != F.col("__dfirst__"))
        )
    return _spans_from_seeds(seeds.select("__id__", "__pos__"), k, id_col)


def strip_spans_incremental(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    k: int | None = None,
    min_count: int = 2,
    keep_first: bool = False,
    output_col: str = "text_deduped",
    _k: int | None = None,
) -> DataFrame:
    """Cut the delta's duplicated spans out
    (:func:`duplicated_spans_incremental` → the shared span cutter):
    NEW documents lose every passage the retained corpus already holds
    (and delta-internal repeats); untouched documents keep their text
    byte-for-byte."""
    spans = duplicated_spans_incremental(
        new_df, id_col, text_col, index, k=k, min_count=min_count,
        keep_first=keep_first, _k=_k,
    )
    return _cut_spans(new_df, id_col, text_col, spans, output_col)


def incremental_substr_corpus(
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index: DataFrame,
    k: int | None = None,
    min_count: int = 2,
    keep_first: bool = False,
    output_col: str = "text_deduped",
) -> tuple[DataFrame, DataFrame]:
    """One substring ingest cycle: ``(stripped_new_docs,
    updated_index)``. The delta is stripped against corpus + itself,
    and the index gains the grams of the text that actually ENTERS the
    corpus (the stripped output — indexing pre-strip text would count
    passages the corpus never retained, inflating future
    ``min_count`` decisions). Write the index to a NEW path, then
    swap, like the sibling cycles."""
    k = _resolve_substr_k(index, k)
    # the stripped output is read twice (corpus write + index build) —
    # cut the lineage so the span pipeline runs once; k is already
    # resolved above, so _k= skips the second metadata probe job
    stripped = truncate_lineage(
        strip_spans_incremental(
            new_df, id_col, text_col, index, k=k, min_count=min_count,
            keep_first=keep_first, output_col=output_col, _k=k,
        ),
        eager=False,
    )
    updated = _substr_merge_unchecked(
        index, substr_index_build(stripped, id_col, output_col, k=k)
    )
    return stripped, updated
