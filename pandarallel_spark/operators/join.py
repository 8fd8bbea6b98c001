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
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """``pd.merge_asof``-shaped join. Per left row and key:

    - ``direction="backward"`` — the latest right row with
      ``right_ts <= left_ts`` (ties at equal ts match);
    - ``direction="forward"`` — the earliest right row with
      ``right_ts >= left_ts``;
    - ``direction="nearest"`` — whichever of the two is closest in
      absolute distance; ties prefer the backward match (pandas rule).

    ``allow_exact_matches=False`` makes the comparisons strict
    (``<`` / ``>``), exactly pandas — implemented purely by flipping
    the side-tag sort inside the same window (equal-ts right rows land
    outside the frame), so the plan shape and cost don't change.

    ``tolerance`` (e.g. ``F.expr("INTERVAL 1 HOUR")``) nulls out matches
    farther than the tolerance in the search direction; for "nearest" it
    bounds each side independently before the closest eligible match is
    chosen — exactly ``pd.merge_asof`` semantics (differential-tested in
    tests/test_join.py).

    All three directions stay the union + keyed-window design (one
    shuffle on the key, no range explosion): backward is a
    ``last(ignorenulls)`` over (unbounded-preceding, current), forward a
    ``first(ignorenulls)`` over (current, unbounded-following) with the
    side tag sorted so equal-ts right rows land inside the frame;
    nearest evaluates both frames over the same shuffle and picks
    per row with plain expressions.

    Right rows must be unique per (key, ts) for deterministic output —
    the same contract pandas merge_asof imposes ("left" keeps the last).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward | forward | nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    value_cols = value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    # output names must be unique against keys, the left ts, the left
    # payload, AND each other; the old fallback re-appended '_asof',
    # which is a no-op for the default suffix and never checked keys —
    # duplicate column names then blew up in unionByName (review
    # finding r4). Keep appending the suffix until the name is free.
    taken = set(keys) | {left_ts, *left_payload}

    def out_name(base: str) -> str:
        cand = f"{base}{suffix}"
        while cand in taken:  # suffix may be '' — always append non-empty
            cand += suffix or "_asof"
        taken.add(cand)
        return cand

    out_ts = out_name(right_ts)
    out_vals = [out_name(c) for c in value_cols]

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

    # backward: right rows (side=0) sort BEFORE left at equal ts → the
    # (unbounded-preceding, current) frame includes rt == lt ("<=").
    # forward: sort side DESC so right rows land AFTER left at equal ts
    # → the (current, unbounded-following) frame includes rt == lt.
    # allow_exact_matches=False flips each side sort, pushing equal-ts
    # right rows OUT of the frame → strict "<" / ">".
    side = F.col("__side__")
    b_tie, f_tie = (side, side.desc()) if allow_exact_matches else (side.desc(), side)
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t__"), b_tie)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t__"), f_tie)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    unioned = l_tagged.unionByName(r_tagged)

    # fill the matched right row as ONE struct (non-null for every right
    # row), then extract fields: per-column ignorenulls fills would skip
    # a matched row's NULL value and pair the matched ts with a value
    # from an OLDER right row — pd.merge_asof keeps the matched row's
    # NULL (review finding r3).
    right_row = F.when(
        F.col("__side__") == 0,
        F.struct(F.col(out_ts).alias("ts"), *[F.col(v).alias(v) for v in out_vals]),
    )
    fills = []
    if direction in ("backward", "nearest"):
        fills.append(F.last(right_row, ignorenulls=True).over(w_b).alias("__b__"))
    if direction in ("forward", "nearest"):
        fills.append(F.first(right_row, ignorenulls=True).over(w_f).alias("__q__"))
    out = unioned.select("*", *fills).filter(F.col("__side__") == 1)
    if direction in ("backward", "nearest"):
        out = out.select(
            "*",
            F.col("__b__.ts").alias("__b_ts__"),
            *[F.col(f"__b__.{v}").alias(f"__b_{v}__") for v in out_vals],
        )
    if direction in ("forward", "nearest"):
        out = out.select(
            "*",
            F.col("__q__.ts").alias("__q_ts__"),
            *[F.col(f"__q__.{v}").alias(f"__q_{v}__") for v in out_vals],
        )

    lt = F.col("__t__")
    if direction == "backward":
        ts_m, pref = F.col("__b_ts__"), "__b_"
        elig = ts_m.isNotNull()
        if tolerance is not None:
            elig = elig & (ts_m >= lt - tolerance)
        val_sel = [F.when(elig, F.col(f"{pref}{v}__")).alias(v) for v in out_vals]
        ts_sel = F.when(elig, ts_m).alias(out_ts)
    elif direction == "forward":
        ts_m, pref = F.col("__q_ts__"), "__q_"
        elig = ts_m.isNotNull()
        if tolerance is not None:
            elig = elig & (ts_m <= lt + tolerance)
        val_sel = [F.when(elig, F.col(f"{pref}{v}__")).alias(v) for v in out_vals]
        ts_sel = F.when(elig, ts_m).alias(out_ts)
    else:  # nearest — tolerance bounds each side, then closest wins
        ts_b, ts_f = F.col("__b_ts__"), F.col("__q_ts__")
        elig_b = ts_b.isNotNull()
        elig_f = ts_f.isNotNull()
        if tolerance is not None:
            elig_b = elig_b & (ts_b >= lt - tolerance)
            elig_f = elig_f & (ts_f <= lt + tolerance)
        # ties (equal distance) prefer backward, matching pandas
        use_b = elig_b & (~elig_f | ((lt - ts_b) <= (ts_f - lt)))
        use_f = elig_f & ~use_b
        val_sel = [
            F.when(use_b, F.col(f"__b_{v}__"))
            .when(use_f, F.col(f"__q_{v}__"))
            .alias(v)
            for v in out_vals
        ]
        ts_sel = F.when(use_b, ts_b).when(use_f, ts_f).alias(out_ts)

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
