"""Engine facade: the user-facing API mirroring pandarallel's 8 operators.

pandarallel monkey-patches ``parallel_*`` methods onto pandas classes
(reference ``core.py:522-556``). We do not monkey-patch Spark classes;
instead ``parallelize(df)`` wraps a DataFrame in a thin facade exposing
the same method names with the same semantics, so a pandarallel user can
port a script mechanically:

    pandarallel:  df.parallel_apply(f, axis=1)
    here:         parallelize(df).parallel_apply(f, axis=1)

    pandarallel:  df.groupby("a").parallel_apply(f)
    here:         parallelize(df).groupby("a").parallel_apply(f)

    pandarallel:  s.rolling(4).parallel_apply(f, raw=False)
    here:         parallelize(df, order_by="id").series("x").rolling(4)
                     .parallel_apply(f, raw=False)

Every method returns a plain ``pyspark.sql.DataFrame`` — the facade adds
no execution machinery of its own; it only routes to the operators
package, which routes to Catalyst.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T

from pandarallel_spark.operators import apply as _apply
from pandarallel_spark.operators import groupby as _groupby
from pandarallel_spark.operators import series as _series
from pandarallel_spark.operators import window as _window
from pandarallel_spark.plans.ordering import with_row_id
from pandarallel_spark.session import configure


def _bind_udf_args(func, args: tuple, kwargs: dict | None):
    """Close extra UDF arguments over a window callable, pandas
    ``rolling.apply(func, args=, kwargs=)`` style. Builtin agg NAMES
    take ``win_args`` instead — extra args on a string are a user
    error worth raising on, not silently dropping."""
    if not args and not kwargs:
        return func
    if not callable(func):
        raise TypeError(
            "args/kwargs bind to callable funcs; builtin aggregate names "
            "take their parameters via win_args (e.g. win_args={'q': 0.5})"
        )
    base, kw = func, kwargs or {}
    return lambda w: base(w, *args, **kw)


class Engine:
    """Session-scoped entry point. ``Engine(spark).frame(df)`` or the
    module-level ``parallelize(df)``."""

    def __init__(self, spark: SparkSession):
        self.spark = configure(spark)

    def frame(self, df: DataFrame, order_by: str | None = None) -> "ParallelFrame":
        return ParallelFrame(df, order_by=order_by)

    def read_parquet(self, path: str, order_by: str | None = None) -> "ParallelFrame":
        return ParallelFrame(self.spark.read.parquet(path), order_by=order_by)


def parallelize(
    df: DataFrame, order_by: str | Sequence[str] | None = None
) -> "ParallelFrame":
    """Wrap a Spark DataFrame with the pandarallel-shaped API.

    ``order_by`` names the column(s) standing in for the pandas row
    index in window operators. A LIST of columns orders windows by the
    lexicographic tuple (global rolling buckets on the first column;
    ewm requires a single column)."""
    return ParallelFrame(df, order_by=order_by)


class ParallelFrame:
    def __init__(self, df: DataFrame, order_by: str | Sequence[str] | None = None):
        self.df = df
        self.order_by = order_by

    def _ordered(self) -> tuple[DataFrame, str]:
        if self.order_by is not None:
            return self.df, self.order_by
        from pandarallel_spark.plans.ordering import ROW_ID

        return with_row_id(self.df), ROW_ID

    # -- reference op #1/#2 (core.py:522-525) --------------------------------
    def parallel_apply(
        self,
        func: Callable | Column | Mapping[str, Column],
        axis: int = 1,
        *,
        args: tuple = (),
        schema: T.StructType | str | None = None,
        elementwise: bool | None = None,
        include_input: bool = True,
        result_name: str = "result",
        vectorize: bool = True,
        **kwargs: Any,
    ) -> DataFrame:
        if axis in (1, "columns"):
            return _apply.apply_rows(
                self.df, func, schema, args=args, kwargs=kwargs,
                include_input=include_input, result_name=result_name,
                vectorize=vectorize,
            )
        if axis in (0, "index"):
            return _apply.apply_columns(
                self.df, func, args=args, kwargs=kwargs, elementwise=elementwise
            )
        raise ValueError(f"invalid axis {axis!r}")  # reference: utils.py:93-99

    # -- reference op #3 (core.py:526-530) -----------------------------------
    def parallel_applymap(
        self, func: Callable, columns: list[str] | None = None,
        schema: T.StructType | None = None, vectorize: bool = True,
    ) -> DataFrame:
        return _apply.applymap(
            self.df, func, columns=columns, schema=schema, vectorize=vectorize
        )

    # -- reference op #7 (core.py:533-535) -----------------------------------
    def groupby(self, *keys: str) -> "ParallelGroupBy":
        flat: list[str] = []
        for k in keys:
            flat.extend(k) if isinstance(k, (list, tuple)) else flat.append(k)
        return ParallelGroupBy(self, flat)

    # -- series accessor (ops #4-#6) -----------------------------------------
    def series(self, col: str) -> "ParallelSeries":
        return ParallelSeries(self, col)


class ParallelSeries:
    def __init__(self, frame: ParallelFrame, col: str, partition_by: Sequence[str] = ()):
        self.frame = frame
        self.col = col
        self.partition_by = tuple(partition_by)

    # -- reference op #4 (core.py:548-550) -----------------------------------
    def parallel_apply(
        self, func: Callable | Column, *, args: tuple = (),
        output_col: str | None = None, return_type: T.DataType | str | None = None,
        vectorize: bool = True,
        **kwargs: Any,
    ) -> DataFrame:
        return _series.series_apply(
            self.frame.df, self.col, func, args=args, kwargs=kwargs,
            output_col=output_col, return_type=return_type, vectorize=vectorize,
        )

    # -- reference op #5 (core.py:551) ---------------------------------------
    def parallel_map(
        self, arg: Callable | Mapping | pd.Series, *,
        output_col: str | None = None, return_type: T.DataType | str | None = None,
        vectorize: bool = True, na_action: str | None = None,
    ) -> DataFrame:
        return _series.series_map(
            self.frame.df, self.col, arg, output_col=output_col,
            return_type=return_type, vectorize=vectorize, na_action=na_action,
        )

    # -- reference ops #6/#8 (core.py:538-556) -------------------------------
    def rolling(
        self,
        window: int | str,
        min_periods: int | None = None,
        center: bool = False,
        closed: str | None = None,
        win_type: str | None = None,
    ) -> "ParallelRolling":
        return ParallelRolling(self, window, min_periods, center, closed, win_type)

    def expanding(self, min_periods: int = 1) -> "ParallelExpanding":
        return ParallelExpanding(self, min_periods)

    def ewm(
        self,
        com: float | None = None,
        span: float | None = None,
        halflife=None,
        alpha: float | None = None,
        min_periods: int = 0,
        adjust: bool = True,
        ignore_na: bool = False,
        times: str | None = None,
    ) -> "ParallelEwm":
        # times: a date/timestamp COLUMN NAME — pandas' wall-clock decay
        # form (halflife must then be timedelta-convertible, e.g. "1h")
        return ParallelEwm(
            self, com=com, span=span, halflife=halflife, alpha=alpha,
            min_periods=min_periods, adjust=adjust, ignore_na=ignore_na,
            times=times,
        )


class ParallelRolling:
    def __init__(
        self, series: ParallelSeries, window: int | str, min_periods: int | None,
        center: bool = False, closed: str | None = None,
        win_type: str | None = None,
    ):
        self.series = series
        self.window = window
        self.min_periods = min_periods
        self.center = center
        self.closed = closed
        self.win_type = win_type

    def parallel_apply(
        self, func: str | Callable, *, raw: bool = True,
        args: tuple = (),
        kwargs: dict | None = None,
        index_col: str | None = None,
        output_col: str | None = None, return_type: T.DataType | str = "double",
        vectorize: bool = True,
        win_args: dict | None = None,
    ) -> DataFrame:
        # win_args: shape kwargs for win_type windows (pandas passes them
        # to the agg call, e.g. rolling(win_type="gaussian").mean(std=2));
        # args/kwargs: extra UDF arguments, pandas rolling.apply(func,
        # args=, kwargs=) — an EXPLICIT dict like pandas', not a
        # **kwargs catch-all (a misspelled option would silently bind as
        # a UDF kwarg and only fail at executor time). The reference
        # forwards them through its worker call
        # (data_types/series_rolling.py:34-44)
        func = _bind_udf_args(func, args, kwargs)
        df, order = self.series.frame._ordered()
        return _window.rolling_apply(
            df, self.series.col, self.window, func, order,
            partition_by=self.series.partition_by, min_periods=self.min_periods,
            center=self.center, closed=self.closed, win_type=self.win_type,
            win_args=win_args,
            raw=raw, index_col=index_col, output_col=output_col,
            return_type=return_type, vectorize=vectorize,
        )


class ParallelEwm:
    def __init__(self, series: ParallelSeries, **kwargs):
        self.series = series
        self.kwargs = kwargs

    def parallel_apply(
        self, func: str = "mean", *, bias: bool = False,
        output_col: str | None = None, positional: bool = False,
    ) -> DataFrame:
        df, order = self.series.frame._ordered()
        kwargs = dict(self.kwargs)
        times = kwargs.pop("times", None)
        if times is not None:
            # pandas validates these at ewm CONSTRUCTION, for every op:
            # com/span/alpha are rejected with times, halflife must be
            # an actual timedelta-like (pandas' check is an isinstance
            # test, window/ewm.py _validate — a float would be
            # Timedelta-CONSTRUCTIBLE as nanoseconds but is still
            # rejected; review finding r8: the check previously ran
            # only on the non-mean branch), and adjust=False is its own
            # NotImplementedError.
            if any(
                kwargs.get(p) is not None for p in ("com", "span", "alpha")
            ):
                raise ValueError(
                    "halflife must be a timedelta convertible object"
                )
            import datetime as _dt

            import numpy as _np

            if not isinstance(
                kwargs.get("halflife"),
                (str, _dt.timedelta, _np.timedelta64),
            ):
                raise ValueError(
                    "halflife must be a timedelta convertible object"
                )
            if not kwargs.pop("adjust", True):
                raise NotImplementedError(
                    "times is not supported with adjust=False."
                )
            # pandas' times-mode surface is mean()-only: sum/var/std
            # SILENTLY fall back to positional decay (times ignored —
            # probed, pandas 2.2). Refuse the trap loudly by default;
            # ``positional=True`` opts into reproducing pandas
            # bit-for-bit for code migrating off the quirk (r8).
            if func != "mean":
                if not positional:
                    raise NotImplementedError(
                        f"ewm(times=...) supports mean() only; pandas "
                        f"{func}() silently ignores times (positional "
                        f"decay). Pass positional=True to reproduce "
                        f"pandas' behavior explicitly."
                    )
                # the quirk, precisely (probed, pandas 2.2.2): deltas
                # are normalized by the Timedelta halflife and the
                # non-mean ops then treat every step as ONE unit — so
                # the result equals positional halflife=1.0 (alpha =
                # 0.5) REGARDLESS of the Timedelta's magnitude;
                # min_periods/ignore_na pass through.
                kwargs["halflife"] = 1.0
            else:
                return _window.ewm_mean_times(
                    df, self.series.col, times, kwargs["halflife"],
                    partition_by=self.series.partition_by,
                    ignore_na=kwargs.get("ignore_na", False),
                    min_periods=kwargs.get("min_periods", 0),
                    output_col=output_col,
                )
        if func in ("var", "std"):
            # grouped: stock pandas per key; global adjust=True: the
            # distributed four-moment bucket carry; global adjust=False:
            # one-partition stock pandas (ewm_moment routes all three)
            return _window.ewm_moment(
                df, self.series.col, order, func,
                partition_by=self.series.partition_by,
                bias=bias, output_col=output_col, **kwargs,
            )
        if func == "sum":
            # grouped: stock pandas per key; global: linear bucket-carry
            # fold (adjust=False raises, as in pandas)
            return _window.ewm_sum(
                df, self.series.col, order,
                partition_by=self.series.partition_by,
                output_col=output_col, **kwargs,
            )
        if func != "mean":
            raise NotImplementedError(
                f"ewm supports mean/var/std/sum, got {func!r}"
            )
        return _window.ewm_mean(
            df, self.series.col, order,
            partition_by=self.series.partition_by,
            output_col=output_col, **kwargs,
        )

    def mean(self, *, output_col: str | None = None) -> DataFrame:
        """pandas-style alias for ``parallel_apply("mean")``."""
        return self.parallel_apply("mean", output_col=output_col)

    def var(
        self, *, bias: bool = False, output_col: str | None = None,
        positional: bool = False,
    ) -> DataFrame:
        """pandas-style alias for ``parallel_apply("var")``.
        ``positional=True`` opts into pandas' silent times-ignoring
        positional decay under ``ewm(times=...)``."""
        return self.parallel_apply(
            "var", bias=bias, output_col=output_col, positional=positional
        )

    def std(
        self, *, bias: bool = False, output_col: str | None = None,
        positional: bool = False,
    ) -> DataFrame:
        """pandas-style alias for ``parallel_apply("std")``."""
        return self.parallel_apply(
            "std", bias=bias, output_col=output_col, positional=positional
        )

    def sum(
        self, *, output_col: str | None = None, positional: bool = False
    ) -> DataFrame:
        """pandas-style alias for ``parallel_apply("sum")``."""
        return self.parallel_apply(
            "sum", output_col=output_col, positional=positional
        )


class ParallelExpanding:
    def __init__(self, series: ParallelSeries, min_periods: int):
        self.series = series
        self.min_periods = min_periods

    def parallel_apply(
        self, func: str | Callable, *, raw: bool = True,
        args: tuple = (),
        kwargs: dict | None = None,
        output_col: str | None = None, return_type: T.DataType | str = "double",
        win_args: dict | None = None,
    ) -> DataFrame:
        func = _bind_udf_args(func, args, kwargs)
        df, order = self.series.frame._ordered()
        return _window.expanding_apply(
            df, self.series.col, func, order,
            partition_by=self.series.partition_by, min_periods=self.min_periods,
            raw=raw, output_col=output_col, return_type=return_type,
            win_args=win_args,
        )


class ParallelGroupBy:
    def __init__(self, frame: ParallelFrame, keys: list[str]):
        self.frame = frame
        self.keys = keys

    # -- reference op #7 -----------------------------------------------------
    def parallel_apply(
        self, func: Callable, *, args: tuple = (),
        schema: T.StructType | str | None = None, mode: str | None = None,
        result_name: str = "result", **kwargs: Any,
    ) -> DataFrame:
        return _groupby.grouped_apply(
            self.frame.df, self.keys, func, schema, args=args, kwargs=kwargs,
            mode=mode, result_name=result_name,
        )

    def agg(self, exprs: Mapping[str, Column]) -> DataFrame:
        """Builtin fast path — JVM-side partial aggregation."""
        return _groupby.grouped_agg(self.frame.df, self.keys, exprs)

    # -- reference op #8: df.groupby(k).col.rolling/expanding ---------------
    def series(self, col: str) -> ParallelSeries:
        return ParallelSeries(self.frame, col, partition_by=self.keys)
