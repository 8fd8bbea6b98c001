"""Rolling and expanding windows, global and grouped.

Reference semantics (pandarallel ``data_types/series_rolling.py``,
``rolling_groupby.py``, ``expanding_groupby.py``; patched at
``core.py:538-556``):
- ``s.rolling(w, min_periods).parallel_apply(func, raw=...)`` — UDF over
  each length-``w`` positional window; first ``min_periods-1`` rows NULL
  (pandas default ``min_periods = w`` for rolling, 1 for expanding).
- grouped variants run per group, output keyed by (group key, original
  position).

Builtin aggregates (sum/mean/min/max/...) stay JVM-side in the window
exec:

    Window.partitionBy(keys).orderBy(order).rowsBetween(-(w-1), 0)

Scale notes:
- *Grouped* windows partition by key → fully parallel; this is the
  easy 100 TB path. AQE splits skewed keys' partitions for the builtin
  path; arbitrary UDFs run stock pandas rolling inside ``applyInPandas``.
- *Global* (ungrouped) UDF rolling would be a single task under a naive
  ``Window.orderBy`` (total order). Instead it runs the reference's own
  overlap-chunk design (``series_rolling.py:16,47`` over-reads
  ``window`` rows per chunk and drops them post-compute) as a Spark
  plan: range-bucket on the order column (approxQuantile boundaries),
  duplicate each bucket's tail ``window-1`` rows into the next bucket
  as halo, run pandas rolling per bucket, drop halo rows. Linear, one
  shuffle, parallel in the bucket count.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# bucket-boundary memo for _halo_rolling: (semanticHash, ord, n) → bnds
_BOUNDARY_MEMO: dict = {}


def _vectorized_rolling(
    vals: np.ndarray,
    window: int,
    min_periods: int,
    center: bool,
    func: Callable,
) -> np.ndarray | None:
    """Evaluate a raw rolling UDF once over the strided ``(w, m)`` window
    matrix instead of m Python calls — the express-or-fallback layer
    (SURVEY.md §4.2b) applied to windows.

    Most real rolling UDFs are elementwise arithmetic of the window
    slots (``x[0] + x[1]**2 …``); on the transposed
    ``sliding_window_view`` each ``x[i]`` is the length-m vector of slot
    i, so the same expression computes every window at once with
    identical IEEE semantics (elementwise float ops are bit-exact vs the
    scalar loop). Funcs this can't serve reject themselves: reductions
    (``np.sum(x)``) change shape, conditionals raise on array truth
    value, ``math.*`` raises TypeError — and a sampled bit-exact check
    against the scalar evaluation guards the rest. Returns None → caller
    falls back to ``pandas.rolling.apply``.
    """
    n = len(vals)
    if n < window:
        return None
    lead = (window - 1) // 2 if center else 0
    start = window - 1 - lead

    # everything derived from pristine vals happens BEFORE the batch
    # call: vals is this function's private copy, but a mutating UDF
    # handed the strided view could otherwise corrupt these
    if np.isnan(vals).any():
        # pandas skips windows with < min_periods non-NaN values
        cnt = np.lib.stride_tricks.sliding_window_view(
            (~np.isnan(vals)).astype("int64"), window
        ).sum(axis=1)
    else:
        cnt = None
    head = (
        pd.Series(vals[: window - 1].copy())
        .rolling(window, min_periods=min_periods, center=center)
        .apply(func, raw=True)
        .to_numpy()
        if start
        else None
    )
    tail = (
        pd.Series(vals[-(window - 1):].copy())
        .rolling(window, min_periods=min_periods, center=center)
        .apply(func, raw=True)
        .to_numpy()
        if lead
        else None
    )

    sw = np.lib.stride_tricks.sliding_window_view(vals, window)
    m = sw.shape[0]
    from pandarallel_spark.operators._vectorize import sample_indices

    # spread sample + finite requirement: a head-only or all-NaN sample
    # would vacuously "match" any shape-(m,) function
    idxs = sample_indices(m, 16)
    try:
        scalar = np.asarray([func(sw[i].copy()) for i in idxs], dtype="float64")
        vec = np.asarray(func(sw.T))
        if vec.shape != (m,):
            return None
        vecf = vec.astype("float64")
    except Exception:  # noqa: BLE001 — any failure means "not vectorizable"
        return None
    if not np.isfinite(scalar).any():
        return None
    if not np.array_equal(vecf[idxs], scalar, equal_nan=True):
        return None
    out = np.full(n, np.nan)
    out[start : start + m] = vecf
    if cnt is not None:
        out[start : start + m] = np.where(cnt < min_periods, np.nan, out[start : start + m])
    # edge positions with truncated frames, precomputed above from
    # pristine vals (frames there only see those boundary rows)
    if head is not None:
        out[:start] = head[:start]
    if tail is not None:
        out[-lead:] = tail[-lead:]
    return out


def _frame_bounds(window: int, center: bool, closed: str | None) -> tuple[int, int]:
    """pandas fixed-window frame offsets (inclusive rowsBetween bounds)
    for a given ``closed``: 'right' (default) = [-(w-1-lead), lead];
    'left' shifts both bounds by −1, 'both' extends the left bound,
    'neither' trims the right — matching pandas' FixedWindowIndexer
    (differentially verified in tests/test_window.py)."""
    lead = (window - 1) // 2 if center else 0
    lo, hi = -(window - 1 - lead), lead
    if closed == "left":
        lo, hi = lo - 1, hi - 1
    elif closed == "both":
        lo -= 1
    elif closed == "neither":
        hi -= 1
    return lo, hi


def _rolling_series(
    s: pd.Series,
    window: int,
    min_periods: int,
    center: bool,
    func: Callable,
    raw: bool,
    vectorize: bool = True,
    closed: str | None = None,
) -> pd.Series:
    """Rolling-apply a Series: vectorized fast path, pandas fallback.

    ``vectorize=False`` forces the stock pandas scalar loop: the fast
    path is elementwise-identical for +,-,*,/ but ``**`` and
    transcendentals may differ from the scalar loop in the last ulp
    (numpy's SIMD pow vs scalar pow) — callers that promise pandas bit
    parity (the compat shim) turn it off. Non-default ``closed`` frames
    always take the pandas path (the strided fast path assumes
    right-closed windows).
    """
    if raw and vectorize and closed in (None, "right"):
        # private copy: to_numpy may hand back a view of the Arrow
        # buffer, and _vectorized_rolling exposes strided views of vals
        # to the UDF
        vals = np.array(s.to_numpy(dtype="float64"), dtype="float64")
        fast = _vectorized_rolling(vals, window, min_periods, center, func)
        if fast is not None:
            return pd.Series(fast, index=s.index)
    return s.rolling(
        window, min_periods=min_periods, center=center, closed=closed
    ).apply(func, raw=raw)

_BUILTIN_AGGS: dict[str, Callable[[Column], Column]] = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "std": F.stddev_samp,
    "var": F.var_samp,
}


def _window_spec(order_by: Sequence[str | Column], partition_by: Sequence[str | Column]):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def rolling_apply(
    df: DataFrame,
    col: str,
    window: int,
    func: str | Callable,
    order_by: str | Column | Sequence,
    *,
    partition_by: Sequence[str] = (),
    min_periods: int | None = None,
    center: bool = False,
    closed: str | None = None,
    win_type: str | None = None,
    raw: bool = True,
    index_col: str | None = None,
    output_col: str | None = None,
    return_type: T.DataType | str = "double",
    vectorize: bool = True,
) -> DataFrame:
    """Rolling fixed-width positional window ending at (or centered on)
    the current row.

    ``func``: name of a builtin ("sum", "mean", ...) → JVM window agg;
    Python callable → ``collect_list`` over the frame + pandas UDF
    (``raw=True`` hands it a numpy array, else a pd.Series — mirroring
    pandas ``rolling.apply(raw=...)``). ``center=True`` matches pandas:
    the frame spans ``[-(w-1-(w-1)//2), +(w-1)//2]`` around each row.

    ``closed`` ('right'|'left'|'both'|'neither') replays pandas frame
    endpoint semantics (reference replays full rolling ``_attributes``,
    ``series_rolling.py:22-28``). ``win_type`` (weighted windows) is NOT
    implemented — rejected loudly rather than silently ignored.

    ``index_col``: for ``raw=False`` UDFs, the column whose values index
    the window Series handed to the UDF (pandas UDFs read ``.index``);
    defaults to the order column. ``raw=True`` windows are plain numpy
    arrays either way.

    ``vectorize`` (raw funcs only): evaluate the UDF once over the
    strided window matrix when a sampled bit-exact check admits it —
    ~50× on arithmetic UDFs; ``**``/transcendentals may differ from the
    pandas scalar loop in the last ulp. Set False for strict pandas bit
    parity.
    """
    if win_type is not None:
        raise NotImplementedError(
            f"win_type={win_type!r} (weighted windows) is not implemented; "
            "pandas evaluates weighted aggregations, not rolling.apply UDFs, "
            "under win_type — use a builtin agg or drop win_type"
        )
    if closed not in (None, "right", "left", "both", "neither"):
        raise ValueError(f"closed must be right|left|both|neither, got {closed!r}")
    if min_periods is None:
        min_periods = window  # pandas rolling default
    order_by = [order_by] if not isinstance(order_by, (list, tuple)) else list(order_by)
    output_col = output_col or f"{col}_rolling_{func if isinstance(func, str) else 'apply'}"

    frame = _frame_bounds(window, center, closed)
    spec = _window_spec(order_by, partition_by).rowsBetween(*frame)
    cnt = F.count(F.col(col)).over(spec)

    if isinstance(func, str):
        agg = _BUILTIN_AGGS[func](F.col(col)).over(spec)
        return df.withColumn(output_col, F.when(cnt >= min_periods, agg))

    if partition_by:
        # grouped UDF windows: stock pandas rolling per group (exact
        # reference semantics, no per-row collect_list arrays)
        return _grouped_pandas_window(
            df, col, order_by, partition_by, output_col, return_type,
            lambda s: _rolling_series(
                s, window, min_periods, center, func, raw, vectorize, closed
            ),
            index_col=None if raw else index_col,
        )

    halo = _halo_rolling(
        df, col, order_by, output_col, return_type,
        window=window, min_periods=min_periods, center=center, closed=closed,
        func=func, raw=raw, vectorize=vectorize,
        index_col=None if raw else index_col,
    )
    if halo is not None:
        return halo

    idx_expr = F.col(index_col) if index_col else (
        F.col(order_by[0]) if isinstance(order_by[0], str) else order_by[0]
    )

    @F.pandas_udf(return_type)
    def apply_window(arrs: pd.Series) -> pd.Series:
        def run(vals):
            # pandas only invokes the func once the window holds
            # min_periods NON-NULL observations (and hands it the window
            # WITH its NaN slots); Spark evaluates every row's frame, so
            # both guards live here — struct collection keeps null rows
            # that a bare collect_list would silently drop.
            if vals is None:
                return None
            x = np.asarray([v["v"] for v in vals], dtype="float64")
            if np.count_nonzero(~np.isnan(x)) < min_periods:
                return None
            if raw:
                return func(x)
            return func(pd.Series(x, index=[v["i"] for v in vals]))

        return arrs.apply(run)

    frame_vals = F.collect_list(
        F.struct(idx_expr.alias("i"), F.col(col).alias("v"))
    ).over(spec)
    return df.withColumn(output_col, apply_window(frame_vals))


def _halo_rolling(
    df: DataFrame,
    col: str,
    order_by: Sequence,
    output_col: str,
    return_type: T.DataType | str,
    *,
    window: int,
    min_periods: int,
    center: bool,
    func: Callable,
    raw: bool,
    vectorize: bool = True,
    closed: str | None = None,
    index_col: str | None = None,
) -> DataFrame | None:
    """Parallel global rolling: literal range buckets + boundary fixup.

    Shape (the reference's overlap-chunk design, ``series_rolling.py:
    16,47``, restructured so the corpus crosses the JVM↔Python boundary
    exactly ONCE — the Arrow round trip is the dominant cost, and the
    previous persist-the-whole-pass design paid it twice and cached the
    full dataset, which does not survive 100 TB):

    1. Bucket boundaries are sampled once with ``approxQuantile`` (a
       bounded JVM-only job at build time) and embedded as literals, so
       every branch buckets identically BY CONSTRUCTION — correctness
       never rides on Catalyst exchange reuse. Ties share a bucket
       (strict ``>`` against boundaries), like ``repartitionByRange``.
    2. The big pass hash-partitions on the bucket id, rolls each bucket
       with pandas/numpy, and emits every row EXCEPT the per-bucket head
       (and tail, when ``center``) rows whose windows lack cross-bucket
       context.
    3. Those come from a JVM-only branch: a ``rank`` window over the
       bucket id extracts each bucket's first/last ``window-1``
       value-ranks (≈ buckets × 2(w−1) rows, tie groups included as
       units so the drop/fix multisets agree with the big pass under
       ANY physical tie order), which funnel into a single tiny Python
       task that re-rolls the edge set in global order — it contains
       every fixed row's true window context by construction — and
       emits just the replacement rows. No persist, no cache, no second
       full pass.

    With one shuffle partition the bucket machinery is skipped entirely
    (a single partition already sees the whole order).

    Returns None when the shape doesn't qualify (multi-column or
    non-orderable order key) — caller falls back to the single-partition
    window form. The order column should be a total order; ties make
    window composition nondeterministic (same caveat as pandas on a
    non-unique index).
    """
    if len(order_by) != 1 or not isinstance(order_by[0], str):
        return None
    ord_col = order_by[0]
    ord_type = df.schema[ord_col].dataType
    if not isinstance(
        ord_type, (T.NumericType, T.DateType, T.TimestampType, T.TimestampNTZType)
    ):
        return None

    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    lo, hi = _frame_bounds(window, center, closed)
    halo_before = -lo  # rows whose frame reaches into the previous bucket
    halo_after = max(hi, 0)
    edge = halo_before + halo_after  # context rows needed per boundary

    out_schema = T.StructType(
        [*df.schema.fields, T.StructField(output_col, _to_dtype(return_type), True)]
    )
    out_names = [f.name for f in out_schema.fields]
    ix = index_col if (index_col and not raw) else ord_col

    def roll_bucket(g: pd.DataFrame) -> np.ndarray:
        s = pd.Series(g[col].to_numpy(), index=g[ix].to_numpy())
        return _rolling_series(
            s, window, min_periods, center, func, raw, vectorize, closed
        ).to_numpy()

    if n_parts <= 1:
        # one partition sees the total order — no halo machinery
        def roll_all(batches):
            parts = [b for b in batches if len(b)]
            if not parts:
                return
            pdf = pd.concat(parts, ignore_index=True).sort_values(
                ord_col, kind="mergesort", ignore_index=True
            )
            pdf[output_col] = roll_bucket(pdf)
            yield pdf[out_names]

        return df.repartition(1).mapInPandas(roll_all, out_schema)

    # 1) literal boundaries (numeric view of the order column; dates and
    # timestamps go through epoch doubles — only bucket ASSIGNMENT uses
    # the double view, windows still order by the original column).
    # Boundaries are memoized per (plan, order, n_parts): re-rolling the
    # same frame (interactive use, min-of-N benches) skips the sampling
    # job. Staleness is benign — boundaries only steer bucket BALANCE;
    # any literal boundaries give correct results.
    if isinstance(ord_type, T.NumericType):
        ord_num = F.col(ord_col).cast("double")
    else:
        ord_num = F.col(ord_col).cast("timestamp").cast("double")
    probs = [i / n_parts for i in range(1, n_parts)]
    try:
        plan_key = (df.semanticHash(), ord_col, n_parts)
    except Exception:  # noqa: BLE001 — fall back to no memo
        plan_key = None
    bnds = _BOUNDARY_MEMO.get(plan_key) if plan_key is not None else None
    if bnds is None:
        qdf = df.select(ord_num.alias("__q__"))
        bnds = sorted(set(qdf.approxQuantile("__q__", probs, 1.0 / (4 * n_parts))))
        if plan_key is not None:
            if len(_BOUNDARY_MEMO) > 64:
                _BOUNDARY_MEMO.clear()
            _BOUNDARY_MEMO[plan_key] = bnds
    if not bnds:  # empty input or constant order column
        bucket_expr = F.lit(0)
    else:
        bucket_expr = sum(
            (F.when(ord_num > F.lit(b), 1).otherwise(0) for b in bnds),
            F.lit(0),
        )
    bucketed = df.withColumn("__bkt__", bucket_expr)
    in_names = [*out_names[:-1], "__bkt__"]

    # Drop/fix membership is defined by VALUE RANK (SQL RANK == pandas
    # rank(method='min')), never by physical row position: the big pass
    # and the JVM edge extraction see ties in different physical orders
    # after their respective shuffles, and positional cuts could drop a
    # row in one branch while the other re-emits a different tied row —
    # losing one and duplicating the other. Rank-based cuts make the
    # selected multiset identical in both branches by construction (a
    # tie group is in or out as a unit); window VALUES on tied rows
    # remain order-dependent, the documented pandas caveat.

    # 2) big pass: roll per bucket, drop context-less head/tail rows
    def roll_buckets(batches):
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        for _, g in pdf.groupby("__bkt__", sort=False):
            g = g.sort_values(ord_col, kind="mergesort", ignore_index=True)
            g[output_col] = roll_bucket(g)
            r_asc = g[ord_col].rank(method="min").to_numpy()
            keep = r_asc > halo_before
            if halo_after:
                r_desc = g[ord_col].rank(method="min", ascending=False).to_numpy()
                keep &= r_desc > halo_after
            out = g.loc[keep, out_names]
            if len(out):
                yield out

    big = bucketed.repartition(n_parts, F.col("__bkt__")).mapInPandas(
        roll_buckets, out_schema
    )

    # 3) JVM-only edge extraction (hash exchange + two per-bucket sorts,
    # no Python): fix rows by value rank; the edge set additionally
    # takes ``edge`` POSITIONAL neighbors beyond the (possibly
    # tie-extended) fix region — per-bucket fix counts come from an
    # unordered window over the same exchange, so every fix row's
    # window context is present even when a large tie group straddles
    # the cut. One tiny task then re-rolls the edge set and emits
    # replacement rows.
    w_a = Window.partitionBy("__bkt__").orderBy(F.col(ord_col))
    w_d = Window.partitionBy("__bkt__").orderBy(F.col(ord_col).desc())
    w_u = Window.partitionBy("__bkt__")
    fhead = F.coalesce(
        F.max(F.when(F.col("__ra__") <= halo_before, F.col("__na__"))).over(w_u),
        F.lit(0),
    )
    ftail = F.coalesce(
        F.max(F.when(F.col("__rd__") <= halo_after, F.col("__nd__"))).over(w_u),
        F.lit(0),
    )
    edges = (
        bucketed.withColumn("__ra__", F.rank().over(w_a))
        .withColumn("__na__", F.row_number().over(w_a))
        .withColumn("__rd__", F.rank().over(w_d))
        .withColumn("__nd__", F.row_number().over(w_d))
        .withColumn("__fh__", fhead)
        .withColumn("__ft__", ftail)
        .filter(
            (F.col("__na__") <= F.col("__fh__") + edge)
            | (F.col("__nd__") <= F.col("__ft__") + edge)
        )
        .withColumn(
            "__fix__",
            (F.col("__ra__") <= halo_before) | (F.col("__rd__") <= halo_after),
        )
        .select(*in_names[:-1], "__fix__")
    )

    def fix_edges(batches):
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        small = pd.concat(parts, ignore_index=True).sort_values(
            ord_col, kind="mergesort", ignore_index=True
        )
        small[output_col] = roll_bucket(small)
        yield small.loc[small["__fix__"], out_names]

    fixed = edges.repartition(1).mapInPandas(fix_edges, out_schema)
    return big.unionByName(fixed)


def _grouped_pandas_window(
    df: DataFrame,
    col: str,
    order_by: Sequence[str],
    partition_by: Sequence[str],
    output_col: str,
    return_type: T.DataType | str,
    pandas_op,
    index_col: str | None = None,
) -> DataFrame:
    """Arbitrary-UDF grouped window via ``applyInPandas``: run the stock
    pandas rolling/expanding op inside each group — the exact semantics
    the reference implements per group (``rolling_groupby.py:63-67``),
    with linear state instead of ``collect_list``'s O(frame) arrays per
    row. One shuffle on the group key; each group is one task, which is
    the same parallelism profile as the reference's whole-group chunks.

    ``index_col``: values to use as the rolled Series' index. Default
    (None) is a group-positional RangeIndex — which is exactly what
    pandas ``GroupBy.rolling`` hands ``raw=False`` UDFs (verified
    differentially: pandas re-indexes each group positionally before
    rolling, regardless of the frame's index).
    """
    order_cols = [c if isinstance(c, str) else c._jc.toString() for c in order_by]
    out_schema = T.StructType(
        [*df.schema.fields, T.StructField(output_col, _to_dtype(return_type), True)]
    )
    out_names = [f.name for f in out_schema.fields]

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        idx = (
            pdf[index_col].to_numpy()
            if index_col is not None
            else np.arange(len(pdf))
        )
        s = pd.Series(pdf[col].to_numpy(), index=idx)
        pdf[output_col] = pandas_op(s).to_numpy()
        return pdf[out_names]

    return df.groupBy(*partition_by).applyInPandas(per_group, out_schema)


def _to_dtype(t: T.DataType | str) -> T.DataType:
    if isinstance(t, str):
        return T.StructType.fromDDL(f"x {t}")[0].dataType
    return t


def expanding_apply(
    df: DataFrame,
    col: str,
    func: str | Callable,
    order_by: str | Column | Sequence,
    *,
    partition_by: Sequence[str] = (),
    min_periods: int = 1,
    raw: bool = True,
    output_col: str | None = None,
    return_type: T.DataType | str = "double",
) -> DataFrame:
    """Expanding (cumulative) window: unboundedPreceding → current row.

    pandas default ``min_periods=1``; the reference's expanding tests use
    ``expanding(min_periods)`` with a weighted-sum UDF
    (``tests/test_pandarallel.py:308-345``).

    Scale note: the reference only patches *grouped* expanding
    (``core.py:538-545``) — that path partitions by key and scales.
    The ungrouped form with an opaque UDF is inherently a total order
    whose every row depends on the full prefix (O(n²) work however
    executed; pandas pays the same serially) — it runs as a
    single-partition window here and is meant for builtin aggregates
    (which stay linear, JVM-side) or small/medium data.
    """
    order_by = [order_by] if not isinstance(order_by, (list, tuple)) else list(order_by)
    output_col = output_col or f"{col}_expanding_{func if isinstance(func, str) else 'apply'}"

    spec = _window_spec(order_by, partition_by).rowsBetween(Window.unboundedPreceding, 0)
    cnt = F.count(F.col(col)).over(spec)

    if isinstance(func, str):
        agg = _BUILTIN_AGGS[func](F.col(col)).over(spec)
        return df.withColumn(output_col, F.when(cnt >= min_periods, agg))

    if partition_by:
        # collect_list over an expanding frame is O(n²) state per group;
        # run pandas expanding inside each group instead (linear, exact)
        return _grouped_pandas_window(
            df, col, order_by, partition_by, output_col, return_type,
            lambda s: s.expanding(min_periods=min_periods).apply(func, raw=raw),
        )

    idx_expr = F.col(order_by[0]) if isinstance(order_by[0], str) else order_by[0]

    @F.pandas_udf(return_type)
    def apply_window(arrs: pd.Series) -> pd.Series:
        def run(vals):
            # min_periods counts NON-NULL observations and the window
            # keeps its NaN slots, like pandas (struct collection — a
            # bare collect_list would drop null rows)
            if vals is None:
                return None
            x = np.asarray([v["v"] for v in vals], dtype="float64")
            if np.count_nonzero(~np.isnan(x)) < min_periods:
                return None
            return func(x if raw else pd.Series(x, index=[v["i"] for v in vals]))

        return arrs.apply(run)

    frame_vals = F.collect_list(
        F.struct(idx_expr.alias("i"), F.col(col).alias("v"))
    ).over(spec)
    return df.withColumn(output_col, apply_window(frame_vals))
