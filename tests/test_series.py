"""Differential tests for Series.parallel_apply / parallel_map
(reference tests/test_pandarallel.py:240-260, fixtures F3)."""

import math

import numpy as np
import pandas as pd
import pytest

from pandarallel_spark import parallelize


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(7)
    return pd.DataFrame({"id": range(1000), "a": rng.random(1000) + 1})


@pytest.fixture(scope="module")
def sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def test_series_apply(spark, pdf, sdf):
    func = lambda x: math.log10(math.sqrt(math.exp(x**2)))  # noqa: E731
    expected = pdf.a.apply(func)
    got = (
        parallelize(sdf).series("a").parallel_apply(func, output_col="r")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["r"], expected, check_names=False)


def test_series_apply_args_kwargs(spark, pdf, sdf):
    # reference tests args=(2,), bias=3 (tests/test_pandarallel.py:248-253)
    func = lambda x, power, bias=0: math.log10(math.sqrt(math.exp(x**power))) + bias  # noqa: E731
    expected = pdf.a.apply(func, args=(2,), bias=3)
    got = (
        parallelize(sdf).series("a")
        .parallel_apply(func, args=(2,), bias=3, output_col="r")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["r"], expected, check_names=False)


def test_series_map_callable(spark, pdf, sdf):
    func = lambda x: x * 3 + 1  # noqa: E731
    expected = pdf.a.map(func)
    got = (
        parallelize(sdf).series("a").parallel_map(func, output_col="r")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_series_equal(got["r"], expected, check_names=False)


def test_series_map_dict_unmatched_null(spark):
    pdf = pd.DataFrame({"k": ["x", "y", "z", "x"]})
    sdf = spark.createDataFrame(pdf)
    expected = pdf.k.map({"x": 10, "y": 20})
    got = (
        parallelize(sdf).series("k").parallel_map({"x": 10, "y": 20}, output_col="r")
        .toPandas()
    )
    # join output is unordered; compare as multisets keyed by k
    got_map = got.groupby("k")["r"].apply(lambda s: sorted(s, key=str)).to_dict()
    assert got_map["x"] == [10, 10]
    assert got_map["y"] == [20]
    assert pd.isna(got_map["z"][0])
    assert expected.isna().sum() == 1


def test_series_map_large_dict_broadcast_join(spark):
    # > _MAP_LITERAL_MAX entries → broadcast-join path
    mapping = {i: i * 2 for i in range(5000)}
    pdf = pd.DataFrame({"k": list(range(0, 6000))})
    sdf = spark.createDataFrame(pdf)
    got = (
        parallelize(sdf).series("k").parallel_map(mapping, output_col="r").toPandas()
        .sort_values("k").reset_index(drop=True)
    )
    expected = pdf.sort_values("k").k.map(mapping).reset_index(drop=True)
    pd.testing.assert_series_equal(got["r"], expected, check_names=False)


def test_series_map_empty_series(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"a": [1.0]})).filter("a > 99")
    got = parallelize(sdf).series("a").parallel_map({1.0: 2.0}, output_col="r").toPandas()
    assert len(got) == 0


def test_series_apply_vectorized_matches_per_element(spark):
    """Batch-vectorized series UDFs must agree with the per-element loop
    for arithmetic funcs and fall back for math.* / non-elementwise."""
    import math

    import numpy as np

    from pandarallel_spark import parallelize

    n = 20_000
    pdf = pd.DataFrame({"x": np.random.default_rng(4).random(n) + 1})
    sdf = spark.createDataFrame(pdf).repartition(8)

    arith = lambda v, a=2, bias=0: v * a + bias + (v * 100) // 7  # noqa: E731
    exp = pdf.x.apply(arith, args=(3,), bias=1.5)
    for flag in (True, False):
        got = (
            parallelize(sdf).series("x")
            .parallel_apply(arith, args=(3,), bias=1.5, output_col="r",
                            return_type="double", vectorize=flag)
            .toPandas()["r"]
        )
        assert np.array_equal(np.sort(got.to_numpy()), np.sort(exp.to_numpy())), flag

    mfunc = lambda v: math.log10(math.sqrt(math.exp(v)))  # noqa: E731
    got = (
        parallelize(sdf).series("x")
        .parallel_apply(mfunc, output_col="r", return_type="double")
        .toPandas()["r"]
    )
    exp = pdf.x.apply(mfunc)
    assert np.array_equal(np.sort(got.to_numpy()), np.sort(exp.to_numpy()))

    sfunc = lambda v: float(np.sum(v))  # noqa: E731  — whole-series reduction
    got = (
        parallelize(sdf).series("x")
        .parallel_apply(sfunc, output_col="r", return_type="double")
        .toPandas()["r"]
    )
    exp = pdf.x.apply(sfunc)
    assert np.array_equal(np.sort(got.to_numpy()), np.sort(exp.to_numpy()))


def test_series_map_na_action(spark):
    """na_action='ignore' must skip the callable on NULL/NaN and emit
    NULL — pandas Series.map parity; na_action=None calls it (and a
    func that chokes on NaN surfaces the error, like pandas)."""
    import numpy as np

    pdf = pd.DataFrame({"x": [1.0, np.nan, 3.0, np.nan, 5.0]})
    sdf = spark.createDataFrame(pdf)
    exp = pdf.x.map(lambda v: v * 10, na_action="ignore")
    got = (
        parallelize(sdf).series("x")
        .parallel_map(lambda v: v * 10, na_action="ignore", output_col="r")
        .toPandas().sort_values("x", na_position="last")["r"]
        .reset_index(drop=True)
    )
    exp = exp.sort_values(na_position="last").reset_index(drop=True)
    pd.testing.assert_series_equal(got, exp, check_names=False)
    with pytest.raises(ValueError, match="na_action"):
        parallelize(sdf).series("x").parallel_map(lambda v: v, na_action="drop")
