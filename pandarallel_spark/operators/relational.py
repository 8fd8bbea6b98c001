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
