"""Point-in-time joins Spark lacks as builtins: as-of and range joins.

The reference has no joins at all beyond dict-map lookup (SURVEY.md
§2.2); these are the time-series staples a migrating pandas user expects
(``pd.merge_asof``) and a training-data pipeline needs for event
alignment.

``asof_join`` is implemented as the *union + keyed window* pattern, not a
point-in-time cross join: tag both sides, union, then one
``last(ignorenulls)`` window per right column over
``partitionBy(keys).orderBy(ts, side)``. Cost = one shuffle on the key —
linear, skew-handled by AQE, no range-explosion. This is the standard
scalable PIT-join design on Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    value_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """``pd.merge_asof``-shaped join: for each left row, the latest right
    row with ``right_ts <= left_ts`` per key (direction="backward"; ties
    at equal ts match). ``tolerance`` (e.g. ``F.expr("INTERVAL 1 HOUR")``)
    nulls out matches older than ``left_ts - tolerance``.

    Right rows must be unique per (key, ts) for deterministic output —
    the same contract pandas merge_asof imposes ("left" keeps the last).
    """
    if direction != "backward":
        raise NotImplementedError("only direction='backward' is implemented")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]
    out_ts = f"{right_ts}{suffix}"
    if out_ts == left_ts or out_ts in left_payload:
        out_ts = f"{right_ts}_asof"
    out_vals = [
        f"{c}{suffix}" if f"{c}{suffix}" not in (left_ts, *left_payload) else f"{c}_asof"
        for c in value_cols
    ]

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(v) for c, v in zip(value_cols, out_vals)],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(out_ts),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t__"),
        F.lit(0).alias("__side__"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(v) for c, v in zip(value_cols, out_vals)],
        F.col(right_ts).alias(out_ts),
    )

    # right rows sort before left rows at equal ts → "<=" match semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t__"), F.col("__side__"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        "*",
        *[F.last(v, ignorenulls=True).over(w).alias(f"__f_{v}__") for v in out_vals],
        F.last(out_ts, ignorenulls=True).over(w).alias("__f_ts__"),
    )
    out = filled.filter(F.col("__side__") == 1)

    matched_ts = F.col("__f_ts__")
    if tolerance is not None:
        in_tol = matched_ts >= (F.col("__t__") - tolerance)
        val_sel = [
            F.when(in_tol, F.col(f"__f_{v}__")).alias(v) for v in out_vals
        ]
        ts_sel = F.when(in_tol, matched_ts).alias(out_ts)
    else:
        val_sel = [F.col(f"__f_{v}__").alias(v) for v in out_vals]
        ts_sel = matched_ts.alias(out_ts)

    return out.select(
        *keys,
        F.col("__t__").alias(left_ts),
        *[F.col(c) for c in left_payload],
        ts_sel,
        *val_sel,
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-keys + range predicate join (e.g. ``r.ts BETWEEN l.ts AND
    l.ts + INTERVAL 1 HOUR``). The equi-key part hash-partitions both
    sides (no cross product); the range predicate filters within key
    groups. For key-free range joins prefer bucketing the range into
    join keys first — a key-free range join is a cross join at scale.
    """
    keys = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in keys:
        eq = left[k] == right[k]
        cond = eq if cond is None else cond & eq
    return left.join(right, cond & condition, how)
