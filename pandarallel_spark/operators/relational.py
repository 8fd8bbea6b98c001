"""Relational utilities beyond the reference's surface: top-k per group,
skew-safe distinct counting, grouping-set rollups, set operations.

The reference has none of these (SURVEY.md §2.2 — "sort/limit/top-k, set
ops: none"), but a complete engine needs them, and each has a distinct
scale story spelled out below.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: Column,
    k: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group via a ranking window — one shuffle on the
    keys; Spark's window exec only keeps the frame, never sorts globally.
    Pass ``tiebreak`` columns to make ranking total (deterministic)."""
    order = [order_by, *[F.col(c) for c in (tiebreak or [])]]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def skew_safe_count_distinct(
    df: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Exact distinct count per key in two mergeable stages:
    groupBy(keys, col) → groupBy(keys). Each stage gets map-side partial
    aggregation, so a hot key's duplicates collapse *before* the shuffle
    — the classic fix for COUNT(DISTINCT) skew. (Spark's built-in
    count_distinct expands internally to the same shape; this form lets
    you salt stage one explicitly if a single (key, value) pair is hot.)

    NULL semantics match ``COUNT(DISTINCT col)``: NULL values don't
    count, and a key whose values are all NULL still appears with count
    0 (stage two counts only non-null value groups, review finding r4 —
    the previous form counted NULL as its own distinct value).
    """
    return (
        df.groupBy(*keys, col)
        .agg(F.lit(1).alias("__one__"))
        .groupBy(*keys)
        .agg(
            F.count(F.when(F.col(col).isNotNull(), F.lit(1))).alias(
                f"{col}_distinct"
            )
        )
    )


def rollup_agg(
    df: DataFrame, keys: list[str], exprs: Mapping[str, Column]
) -> DataFrame:
    """GROUP BY ROLLUP: per-key subtotals + grand total in one pass
    (Spark expands grouping sets map-side; no extra scan per level)."""
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in exprs.items()])


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set union by column NAME (unionByName guards against positional
    mistakes); distinct is one hash shuffle."""
    return a.unionByName(b).distinct()


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT (set difference, distinct output): rows of ``a`` that
    appear nowhere in ``b``. ``subtract`` is Spark's set-EXCEPT; the
    previous ``exceptAll().distinct()`` kept any row whose multiplicity
    in ``a`` exceeded its multiplicity in ``b`` — wrong whenever both
    sides hold duplicates of a shared row (review finding r4)."""
    return a.subtract(b)


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count=None,
    capacity: int = 4096,
    exact: bool = True,
    min_share: float | None = None,
    include_bounds: bool = False,
) -> DataFrame:
    """Frequent items (heavy hitters) without ever shuffling the full
    key universe: the Misra-Gries summary, run map-side per partition
    and merged — the classic MERGEABLE frequency sketch (Misra &
    Gries '82; mergeability per Agarwal et al., "Mergeable Summaries",
    PODS '12: combine counters, subtract the (capacity+1)-th largest,
    drop non-positive).

    Why not ``groupBy(col).count()``: at 100 TB the key universe (e.g.
    every distinct token of a web corpus) is itself huge — the exact
    aggregate shuffles ALL of it to find the few hot keys. Here each
    partition keeps ≤ ``capacity`` counters (bounded memory regardless
    of input), ships ≤ capacity+1 bounded rows, and only the merged
    CANDIDATE set — guaranteed a superset of every key with true count
    ≥ min_count, since a key's merged lower bound undercounts by at
    most Σ_p decr_p ≤ N/(capacity+1) — touches a shuffle again.

    ``exact=True`` (default) adds the classic second pass: an exact
    count restricted to candidates (broadcast semi-join pushes the key
    filter into the scan), so the output EQUALS
    ``groupBy(col).count().filter(count >= min_count)`` bit-for-bit —
    verifiable against any SQL oracle — while the full universe still
    never pays a shuffle. ``exact=False`` returns one row per candidate
    with the sketch's bounds: (key, lower_bound, upper_bound) where
    lower ≤ true ≤ upper is guaranteed.

    The threshold is either ``min_count`` (an absolute int) or
    ``min_share`` (a fraction of total non-null rows — computed from
    the SAME summary pass, no extra scan, so it stays scale-invariant).
    ``include_bounds=True`` attaches the sketch envelope
    (lower_bound, upper_bound) to each exact row — what an
    error-contract oracle asserts. For a tight candidate set pick
    capacity ≳ N/min_count; correctness holds for ANY capacity.

    NULL keys are ignored (SQL aggregate convention).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be ≥ 1, got {capacity}")
    if (min_count is None) == (min_share is None):
        raise ValueError("pass exactly one of min_count, min_share")
    import pandas as pd

    src = df.select(F.col(col).cast("string").alias("__k__")).filter(
        F.col("__k__").isNotNull()
    )

    def mg_partition(pdf_iter):
        counts = pd.Series(dtype="int64")
        decr = 0
        nrows = 0
        seen = False
        for pdf in pdf_iter:
            seen = True
            nrows += len(pdf)
            vc = pdf["__k__"].value_counts()
            counts = counts.add(vc, fill_value=0).astype("int64")
            if len(counts) > capacity:
                sub = int(counts.nlargest(capacity + 1).iloc[-1])
                counts = counts[counts > sub] - sub
                decr += sub
        if not seen:
            return
        out = pd.DataFrame(
            {"__k__": counts.index.astype(str), "__c__": counts.to_numpy()}
        )
        out["__n__"] = 0
        # one NULL-key row per partition carries its total decrement —
        # the additive term of the global error bound — and the
        # partition's row count (so a share-based threshold needs no
        # second scan)
        out = pd.concat(
            [out, pd.DataFrame({"__k__": [None], "__c__": [decr], "__n__": [nrows]})],
            ignore_index=True,
        )
        yield out

    # the summary is consumed by two branches (merge + error totals) —
    # persist the ≤ partitions×(capacity+1) bounded rows so the sketch
    # pass scans the input once, not twice
    summ = src.mapInPandas(
        mg_partition, "__k__ string, __c__ long, __n__ long"
    ).persist()
    merged = (
        summ.filter(F.col("__k__").isNotNull())
        .groupBy("__k__")
        .agg(F.sum("__c__").alias("__lb__"))
    )
    total_decr = summ.filter(F.col("__k__").isNull()).agg(
        F.coalesce(F.sum("__c__"), F.lit(0)).alias("__decr__"),
        F.coalesce(F.sum("__n__"), F.lit(0)).alias("__nn__"),
    )
    if min_share is not None:
        thr = F.ceil(F.col("__nn__") * F.lit(float(min_share))).cast("long")
    elif isinstance(min_count, Column):
        thr = min_count
    else:
        thr = F.lit(int(min_count))
    # candidate gate: true ≤ lb + total_decr, so true ≥ T ⇒ lb ≥ T − decr
    candidates = merged.join(F.broadcast(total_decr)).filter(
        F.col("__lb__") + F.col("__decr__") >= thr
    )
    if not exact:
        return candidates.select(
            F.col("__k__").alias(col),
            F.col("__lb__").alias("lower_bound"),
            (F.col("__lb__") + F.col("__decr__")).alias("upper_bound"),
        )
    cand_keys = candidates.select("__k__")
    counted = (
        src.join(F.broadcast(cand_keys), "__k__", "left_semi")
        .groupBy("__k__")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    extra = (
        # include_bounds: attach the sketch's envelope to each exact
        # row, so a caller (or an error-contract oracle) can assert
        # lower ≤ exact ≤ upper — guaranteed by MG regardless of
        # partitioning, hence deterministic
        [
            F.col("__lb__").alias("lower_bound"),
            (F.col("__lb__") + F.col("__decr__")).alias("upper_bound"),
        ]
        if include_bounds
        else []
    )
    joined = (
        counted.join(F.broadcast(candidates), "__k__")
        if include_bounds
        else counted.join(F.broadcast(total_decr))
    )
    return joined.filter(F.col("count") >= thr).select(
        F.col("__k__").alias(col), "count", *extra
    )


def grouped_heavy_hitters(
    df: DataFrame,
    group_col: str,
    col: str,
    min_count: int | None = None,
    capacity: int = 4096,
    min_share: float | None = None,
) -> DataFrame:
    """Per-group frequent items — e.g. top tokens per language of a
    multilingual corpus. The Misra-Gries summary runs over the
    COMPOSITE (group, key): one global capacity bounds executor memory
    regardless of how many groups exist, and the merged lower bound
    undercounts any composite by at most Σ_p decr_p ≤ N/(capacity+1) —
    the same superset guarantee as ``heavy_hitters``, with the error
    budget shared across groups (size capacity generously when one
    group dominates the row count).

    The threshold is per GROUP: ``min_count`` absolute, or ``min_share``
    of the group's total rows (group totals come from one exact
    map-side-combined aggregate — |groups| rows, broadcast). Output is
    always exact: candidates are recounted behind a broadcast semi
    join, so the result EQUALS
    ``groupBy(group, key).count().filter(count >= T_group)``.

    NULL groups or keys are ignored.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be ≥ 1, got {capacity}")
    if (min_count is None) == (min_share is None):
        raise ValueError("pass exactly one of min_count, min_share")
    import pandas as pd

    src = df.select(
        F.col(group_col).cast("string").alias("__g__"),
        F.col(col).cast("string").alias("__k__"),
    ).filter(F.col("__g__").isNotNull() & F.col("__k__").isNotNull())

    def mg_partition(pdf_iter):
        counts = None  # lazily a MultiIndex (group, key) → count Series
        decr = 0
        seen = False
        for pdf in pdf_iter:
            seen = True
            vc = pdf[["__g__", "__k__"]].value_counts()
            counts = (
                vc.astype("int64")
                if counts is None
                else counts.add(vc, fill_value=0).astype("int64")
            )
            if len(counts) > capacity:
                sub = int(counts.nlargest(capacity + 1).iloc[-1])
                counts = counts[counts > sub] - sub
                decr += sub
        if not seen or counts is None:
            return
        idx = counts.index
        out = pd.DataFrame({
            "__g__": idx.get_level_values(0).astype(str),
            "__k__": idx.get_level_values(1).astype(str),
            "__c__": counts.to_numpy(),
        })
        out = pd.concat(
            [out, pd.DataFrame({"__g__": [None], "__k__": [None], "__c__": [decr]})],
            ignore_index=True,
        )
        yield out

    summ = src.mapInPandas(
        mg_partition, "__g__ string, __k__ string, __c__ long"
    ).persist()
    merged = (
        summ.filter(F.col("__k__").isNotNull())
        .groupBy("__g__", "__k__")
        .agg(F.sum("__c__").alias("__lb__"))
    )
    total_decr = summ.filter(F.col("__k__").isNull()).agg(
        F.coalesce(F.sum("__c__"), F.lit(0)).alias("__decr__")
    )
    gtot = src.groupBy("__g__").agg(F.count(F.lit(1)).alias("__gn__"))
    if min_share is not None:
        thr = F.ceil(F.col("__gn__") * F.lit(float(min_share))).cast("long")
    else:
        thr = F.lit(int(min_count))
    candidates = (
        merged.join(F.broadcast(total_decr))
        .join(F.broadcast(gtot), "__g__")
        .filter(F.col("__lb__") + F.col("__decr__") >= thr)
        .select("__g__", "__k__", "__gn__")
    )
    counted = (
        src.join(F.broadcast(candidates.select("__g__", "__k__")),
                 ["__g__", "__k__"], "left_semi")
        .groupBy("__g__", "__k__")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return (
        counted.join(F.broadcast(candidates), ["__g__", "__k__"])
        .filter(F.col("count") >= thr)
        .select(
            F.col("__g__").alias(group_col),
            F.col("__k__").alias(col),
            "count",
        )
    )
