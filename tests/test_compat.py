"""Drop-in shim differential tests: the reference's OWN test method
(``tests/test_pandarallel.py`` asserts ``res.equals(res_parallel)``)
applied to ``pandarallel_spark.compat``. Workload shapes mirror the
reference's: stdlib-math UDFs, 1000-row and tiny frames, lambdas,
args/kwargs forwarding, multi-key groupby, exception transparency.
"""

import math

import numpy as np
import pandas as pd
import pytest

from pandarallel_spark.compat import pandarallel

# ---------------------------------------------------------------------------
# pandas-version gates (r9, verdict task 7). The reference validates its
# shim against a 7-version pandas matrix
# (/root/reference/.github/workflows/run_tests.yml:17-45) because parts
# of the surface it replicates are VERSION-VARIANT: DataFrame.map
# replaced applymap in 2.1, and groupby.apply's result-shape internals
# (grouping-column inclusion / the include_groups deprecation) changed
# through 2.2. This suite differentials against exactly ONE installed
# pandas, so the tests that encode version-variant behavior carry an
# explicit gate: outside the validated range they FAIL LOUDLY with the
# contract named, instead of silently comparing the shim against
# semantics it was never validated for. Bumping pandas ⇒ revalidate the
# named contract, then widen the range here.
# ---------------------------------------------------------------------------
_PD = tuple(int(x) for x in pd.__version__.split(".")[:2])


def _require_validated_pandas(low: tuple, high: tuple, contract: str) -> None:
    if not (low <= _PD < high):
        pytest.fail(
            f"pandas {pd.__version__} is outside the validated range "
            f"[{'.'.join(map(str, low))}, {'.'.join(map(str, high))}) for "
            f"this version-variant differential — contract: {contract}. "
            "Revalidate against the new pandas and widen the gate in "
            "tests/test_compat.py."
        )


def _gate_applymap() -> None:
    _require_validated_pandas(
        (2, 1), (2, 3),
        "DataFrame.map exists (2.1 renamed applymap; parallel_applymap "
        "must keep matching the elementwise-map semantics, and on <2.1 "
        "the comparison target would have to be df.applymap)",
    )


def _gate_groupby_shape() -> None:
    _require_validated_pandas(
        (2, 0), (2, 3),
        "groupby.apply result-shape internals the shim replicates "
        "(scalar→Series with group index, frame→stacked shape, "
        "None-returning mutator→empty; grouping-column handling changed "
        "across 2.x via the include_groups deprecation)",
    )


@pytest.fixture(scope="module", autouse=True)
def _init(spark):
    # reuse the test session; initialize() would build the same one
    import pandarallel_spark.compat as compat

    compat._SPARK = spark
    compat._patch()
    yield


@pytest.fixture(params=[1000, 1])
def df(request):
    n = request.param
    rng = np.random.default_rng(42)
    return pd.DataFrame(
        {
            "a": rng.integers(1, 8, n),
            "b": rng.random(n),
            "c": rng.random(n) + 1,
            "d": rng.random(n),
            "e": rng.random(n),
        }
    )


def test_df_apply_axis_1(df):
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    assert df.apply(func, axis=1).equals(df.parallel_apply(func, axis=1))


def test_df_apply_axis_1_frame_return(df):
    def func(row):
        return pd.Series({"s": row.b + row.c, "p": row.b * row.c})

    assert df.apply(func, axis=1).equals(df.parallel_apply(func, axis=1))


def test_df_apply_axis_0(df):
    func = lambda x: x.max() - x.min()  # noqa: E731
    res = df[["b", "c", "d", "e", "a"]].parallel_apply(func, axis=0)
    expected = df[["b", "c", "d", "e", "a"]].apply(func, axis=0)
    pd.testing.assert_series_equal(res, expected, check_dtype=False)


def test_df_apply_invalid_axis(df):
    with pytest.raises(ValueError):
        df.parallel_apply(lambda r: r, axis=7)


def test_df_applymap(df):
    _gate_applymap()
    func = lambda x: math.sin(x**2) - math.cos(x**2)  # noqa: E731
    assert df.map(func).equals(df.parallel_applymap(func))


def test_series_apply_with_args_kwargs(df):
    func = lambda x, power, bias=0: math.log10(math.sqrt(math.exp(x**power))) + bias  # noqa: E731
    expected = df.c.apply(func, args=(2,), bias=3)
    got = df.c.parallel_apply(func, args=(2,), bias=3)
    assert expected.equals(got)


def test_series_map(df):
    func = lambda x: x * 2  # noqa: E731
    assert df.b.map(func).equals(df.b.parallel_map(func))


def test_series_map_dict():
    s = pd.Series(["x", "y", "z", "x"] * 300)
    mapping = {"x": 1, "y": 2}
    assert s.map(mapping).equals(s.parallel_map(mapping))


def test_series_rolling(df):
    func = lambda x: x.iloc[0] + x.iloc[1] ** 2 + x.iloc[2] ** 3 + x.iloc[3] ** 4  # noqa: E731
    if len(df) < 4:
        pytest.skip("needs >= window rows")
    expected = df.b.rolling(4).apply(func, raw=False)
    got = df.b.rolling(4).parallel_apply(func, raw=False)
    pd.testing.assert_series_equal(expected, got)


def test_series_rolling_closed_left(df):
    """Rolling attribute replay: closed= must forward (reference replays
    full _attributes, series_rolling.py:22-28)."""
    if len(df) < 5:
        pytest.skip("needs >= window rows")
    func = lambda x: float(x.sum())  # noqa: E731
    expected = df.b.rolling(4, min_periods=2, closed="left").apply(func, raw=True)
    got = df.b.rolling(4, min_periods=2, closed="left").parallel_apply(func, raw=True)
    pd.testing.assert_series_equal(expected, got)


def test_series_rolling_index_reading_udf():
    """raw=False UDFs must see the ORIGINAL index slice through the
    shim, like stock pandas rolling (float index, reference test
    shapes :190)."""
    rng = np.random.default_rng(5)
    s = pd.Series(rng.random(500), index=np.arange(500) * 0.5)
    func = lambda w: float(w.index.max()) + float(w.iloc[-1])  # noqa: E731
    expected = s.rolling(3).apply(func, raw=False)
    got = s.rolling(3).parallel_apply(func, raw=False)
    pd.testing.assert_series_equal(expected, got)


def test_groupby_apply_scalar(df):
    _gate_groupby_shape()
    func = lambda g: g.b.sum() - g.c.max()  # noqa: E731
    expected = df.groupby("a").apply(func)
    got = df.groupby("a").parallel_apply(func)
    pd.testing.assert_series_equal(expected, got, check_dtype=False)


def test_groupby_apply_multikey():
    _gate_groupby_shape()
    rng = np.random.default_rng(0)
    n = 1000
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 4, n),
            "b": rng.integers(0, 3, n),
            "x": rng.random(n),
        }
    )
    func = lambda g: float(g.x.sum())  # noqa: E731
    expected = pdf.groupby(["a", "b"]).apply(func)
    got = pdf.groupby(["a", "b"]).parallel_apply(func)
    pd.testing.assert_series_equal(expected, got, check_dtype=False)


def test_groupby_apply_frame_return():
    _gate_groupby_shape()
    rng = np.random.default_rng(1)
    n = 1200
    pdf = pd.DataFrame({"a": rng.integers(0, 5, n), "x": rng.random(n)})

    def func(g):
        out = g.copy()
        out["x2"] = out.x * 2
        return out

    expected = pdf.groupby("a").apply(func)
    got = pdf.groupby("a").parallel_apply(func)
    # pandas wraps with a (key, orig_idx) MultiIndex; the shim returns the
    # stacked frame on the original index (reference "mutated" shape) —
    # compare values on the sorted original index
    exp_flat = expected.reset_index(drop=True).sort_values(["a", "x"]).reset_index(drop=True)
    got_flat = got.reset_index(drop=True).sort_values(["a", "x"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(exp_flat, got_flat, check_dtype=False)


def test_grouped_rolling():
    rng = np.random.default_rng(2)
    n = 2000
    pdf = pd.DataFrame({"a": rng.integers(0, 7, n), "b": rng.random(n)})
    func = lambda x: float(np.sum(x**2))  # noqa: E731
    expected = pdf.groupby("a").b.rolling(4).apply(func, raw=True)
    got = pdf.groupby("a").b.rolling(4).parallel_apply(func, raw=True)
    pd.testing.assert_series_equal(expected, got)


def test_grouped_expanding():
    rng = np.random.default_rng(3)
    n = 1500
    pdf = pd.DataFrame({"a": rng.integers(0, 7, n), "b": rng.random(n)})
    func = lambda x: float(np.mean(x))  # noqa: E731
    expected = pdf.groupby("a").b.expanding(2).apply(func, raw=True)
    got = pdf.groupby("a").b.expanding(2).parallel_apply(func, raw=True)
    pd.testing.assert_series_equal(expected, got)


def test_exception_transparency():
    pdf = pd.DataFrame({"x": np.arange(1000, dtype="float64")})
    with pytest.raises(ZeroDivisionError):
        pdf.x.parallel_apply(lambda v: v / 0)


def test_float_index_roundtrip():
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame({"x": rng.random(500)}, index=rng.random(500))
    func = lambda v: math.sqrt(v)  # noqa: E731
    assert pdf.x.apply(func).equals(pdf.x.parallel_apply(func))


def test_empty_and_tiny():
    _gate_applymap()
    empty = pd.DataFrame({"a": pd.Series(dtype="float64")})
    assert empty.parallel_applymap(lambda x: x + 1).equals(empty.map(lambda x: x + 1))
    one = pd.Series([2.0])
    assert one.parallel_apply(lambda x: x * 3).equals(one.apply(lambda x: x * 3))


def test_groupby_order_sensitive_func():
    _gate_groupby_shape()
    """Group rows must reach func in original pandas order (shuffle
    arrival order is nondeterministic) — reviewed-bug regression."""
    rng = np.random.default_rng(9)
    n = 3000
    pdf = pd.DataFrame({"a": rng.integers(0, 6, n), "x": rng.random(n)})
    func = lambda g: float(g.x.iloc[-1] - g.x.iloc[0])  # noqa: E731  order-sensitive
    expected = pdf.groupby("a").apply(func)
    got = pdf.groupby("a").parallel_apply(func)
    pd.testing.assert_series_equal(expected, got, check_dtype=False)


def test_rolling_args_forwarded():
    rng = np.random.default_rng(10)
    s = pd.Series(rng.random(2000))
    func = lambda x, p, bias=0: float(np.sum(x**p)) + bias  # noqa: E731
    expected = s.rolling(4).apply(func, raw=True, args=(2,), kwargs={"bias": 3})
    got = s.rolling(4).parallel_apply(func, raw=True, args=(2,), kwargs={"bias": 3})
    pd.testing.assert_series_equal(expected, got)


def test_axis0_mixed_dtype_falls_back():
    rng = np.random.default_rng(11)
    n = 1000
    pdf = pd.DataFrame(
        {
            "s": ["t"] * n,
            "b": rng.random(n),
            "c": rng.random(n),
            "d": rng.random(n),
            "e": rng.random(n),
        }
    )
    func = lambda col: col.iloc[0]  # noqa: E731
    pd.testing.assert_series_equal(
        pdf.parallel_apply(func, axis=0), pdf.apply(func, axis=0)
    )


def test_axis0_int_dtype_preserved_in_func():
    """melt upcasts to float; the shim must hand func the original
    int column, not a float cast — reviewed-bug regression."""
    rng = np.random.default_rng(12)
    n = 1000
    pdf = pd.DataFrame({f"c{i}": rng.integers(0, 100, n) for i in range(6)})
    func = lambda col: str(col.dtype)  # noqa: E731
    # dtype probe via transform shape would break; use reduce shape with
    # a dtype-sensitive computation instead
    red = lambda col: float(col.max() - col.min()) if col.dtype == "int64" else -1.0  # noqa: E731
    got = pdf.parallel_apply(red, axis=0)
    expected = pdf.apply(red, axis=0)
    pd.testing.assert_series_equal(got, expected, check_dtype=False)
    assert (got >= 0).all()  # all columns saw int64
    _ = func


def test_progress_bridge_renders(spark):
    """spark_progress polls StatusTracker and repaints task bars while
    an action runs (the reference's progress_bar=True channel)."""
    import io

    from pandarallel_spark.progress import spark_progress

    buf = io.StringIO()
    with spark_progress(spark, out=buf, interval=0.02):
        spark.range(0, 2_000_000, 1, 32).selectExpr("sum(id * 2)").collect()
        import time as _t

        _t.sleep(0.1)  # let at least one poll land
    txt = buf.getvalue()
    assert "stage" in txt or txt == ""  # races allowed, but no garbage
    # the SAME instance must be re-usable and exception-safe
    p = spark_progress(spark, out=io.StringIO(), interval=0.02)
    with p:
        spark.range(0, 500_000, 1, 16).selectExpr("sum(id)").collect()
    first = p._rendered
    buf2 = io.StringIO()
    p._out = buf2
    with p:
        spark.range(0, 500_000, 1, 16).selectExpr("sum(id + 1)").collect()
    assert p._rendered or not first  # second entry polls afresh
    try:
        with spark_progress(spark, out=io.StringIO(), interval=0.02):
            raise RuntimeError("boom")
    except RuntimeError:
        pass


def test_groupby_none_returning_mutator_matches_pandas():
    _gate_groupby_shape()
    """None-returning (in-place mutating) group funcs: pandas yields an
    empty result; the shim must match, not crash or emit junk."""
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({"a": rng.integers(0, 5, 300), "b": rng.random(300)})

    def mutate_in_place(g):
        g["b2"] = g.b * 2

    expected = pdf.groupby("a").apply(mutate_in_place)
    got = pdf.groupby("a").parallel_apply(mutate_in_place)
    assert len(got) == len(expected) == 0


def test_df_apply_axis_0_transform_through_shim():
    """Reference transform shapes (tests/test_pandarallel.py:145-157):
    column -> same-length column through the shim, no flags."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({c: rng.random(500) for c in "abcde"})
    func = lambda col: col * 2  # noqa: E731
    expected = pdf.apply(func, axis=0)
    got = pdf.parallel_apply(func, axis=0)
    pd.testing.assert_frame_equal(expected, got, check_dtype=False)
    ident = pdf.parallel_apply(lambda col: col, axis=0)
    pd.testing.assert_frame_equal(pdf, ident, check_dtype=False)


def test_groupby_apply_mixed_dtype_series_return():
    _gate_groupby_shape()
    """describe-like Series per group: an int count, a float mean, and a
    string mode in ONE result Series. The old single-type schema derived
    from the whole (object) Series mis-cast or failed at the Arrow
    boundary (ADVICE r5); per-label types must reproduce stock pandas
    column dtypes exactly."""
    rng = np.random.default_rng(5)
    n = 900
    pdf = pd.DataFrame(
        {
            "a": rng.integers(0, 6, n),
            "x": rng.random(n),
            "tag": rng.choice(["red", "green", "blue"], n),
        }
    )

    def func(g):
        return pd.Series(
            {
                "n": int(len(g)),
                "mean_x": float(g.x.mean()),
                "top_tag": g.tag.mode().iloc[0],
            }
        )

    expected = pdf.groupby("a").apply(func)
    got = pdf.groupby("a").parallel_apply(func)
    pd.testing.assert_frame_equal(expected, got)
    assert str(got["n"].dtype) == str(expected["n"].dtype)
    assert str(got["top_tag"].dtype) == str(expected["top_tag"].dtype)


def test_axis0_prefix_dtype_widening_guarded():
    """axis=0 result dtypes are inferred from a 256-row prefix; a func
    whose full-column result widens past that inference (here: floats
    appear only when a value beyond the prefix is present) must raise,
    never silently truncate (ADVICE r5). A value-PRESERVING widening
    (whole floats back to the sampled int) still passes through."""
    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {c: rng.integers(0, 100, n).astype("int64") for c in "abcde"}
    )
    pdf.loc[n - 1, "c"] = 100_001  # beyond every 256-row prefix

    def widening(s):
        # int column -> int result on the prefix, float result (with
        # real fractional values) once the big value is in scope
        return s / 2 if (s > 100_000).any() else s

    with pytest.raises(Exception, match="sample prefix"):
        pdf.parallel_apply(widening, axis=0)

    def preserving(s):
        # float result whose values are all whole -> fits sampled int64
        return (s * 2).astype("float64") if (s > 100_000).any() else s * 2

    expected = pdf.apply(preserving, axis=0)
    got = pdf.parallel_apply(preserving, axis=0)
    pd.testing.assert_frame_equal(expected, got, check_dtype=False)


def test_compat_series_map_na_action():
    """The reference forwards map kwargs to pandas
    (data_types/series.py:52-56), so na_action='ignore' must pass
    through both the callable and lookup branches, matching stock
    pandas bit-for-bit."""
    import numpy as np

    s = pd.Series([1.0, np.nan, 3.0] * 400)  # above the local threshold
    exp = s.map(lambda v: v * 3, na_action="ignore")
    got = s.parallel_map(lambda v: v * 3, na_action="ignore")
    pd.testing.assert_series_equal(got, exp)
    exp2 = s.map({1.0: "a", 3.0: "b"}, na_action="ignore")
    got2 = s.parallel_map({1.0: "a", 3.0: "b"}, na_action="ignore")
    pd.testing.assert_series_equal(got2, exp2)
