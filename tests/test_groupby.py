"""Differential tests for DataFrameGroupBy.parallel_apply (reference
tests/test_pandarallel.py:272-305; fixture F5) — scalar, Series and
DataFrame UDF returns, multi-key (float key) groupby."""

import numpy as np
import pandas as pd
import pytest

from pandarallel_spark import parallelize


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.default_rng(5)
    n = 3000
    return pd.DataFrame(
        {
            "a": rng.integers(1, 100, n),  # includes single-member groups
            "b": rng.random(n),
            "c": rng.random(n),
        }
    )


@pytest.fixture(scope="module")
def sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def test_scalar_return(spark, pdf, sdf):
    func = lambda g: g.b.min() - g.c.max()  # noqa: E731
    expected = (
        pdf.groupby("a")[["b", "c"]].apply(func).rename("result").reset_index()
    )
    got = (
        parallelize(sdf).groupby("a").parallel_apply(func)
        .toPandas().sort_values("a").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, expected.sort_values("a").reset_index(drop=True), check_dtype=False
    )


def test_frame_return(spark, pdf, sdf):
    # reference :106-114 — DataFrame per group with named agg columns
    func = lambda g: pd.DataFrame(  # noqa: E731
        [[g.b.mean(), g.b.min(), g.b.max()]], columns=["b_mean", "b_min", "b_max"]
    )
    expected = (
        pdf.groupby("a")
        .apply(lambda g: func(g), include_groups=False)
        .reset_index(level=0)
        .reset_index(drop=True)
    )
    got = (
        parallelize(sdf).groupby("a").parallel_apply(func)
        .toPandas().sort_values("a").reset_index(drop=True)
    )
    cols = ["a", "b_mean", "b_min", "b_max"]
    pd.testing.assert_frame_equal(
        got[cols],
        expected.sort_values("a").reset_index(drop=True)[cols],
        check_dtype=False,
    )


def test_series_return(spark, pdf, sdf):
    func = lambda g: pd.Series({"lo": g.b.min(), "hi": g.b.max()})  # noqa: E731
    expected = pdf.groupby("a")[["b", "c"]].apply(func).reset_index()
    got = (
        parallelize(sdf).groupby("a").parallel_apply(func)
        .toPandas().sort_values("a").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, expected.sort_values("a").reset_index(drop=True), check_dtype=False
    )


def test_multi_key_float(spark):
    # reference :287-293 groups by ["a", "b"] where b is float
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "a": rng.integers(1, 5, 500),
            "b": rng.integers(0, 3, 500).astype("float64"),
            "c": rng.random(500),
        }
    )
    sdf = spark.createDataFrame(pdf)
    func = lambda g: g.c.sum()  # noqa: E731
    expected = pdf.groupby(["a", "b"])[["c"]].apply(func).rename("result").reset_index()
    got = (
        parallelize(sdf).groupby("a", "b").parallel_apply(func)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got,
        expected.sort_values(["a", "b"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_mutation_passthrough(spark, pdf, sdf):
    # reference "mutated groups" (dataframe_groupby.py:37): UDF returns the
    # group frame itself, transformed — a per-group identity-shaped map
    func = lambda g: g.assign(b2=g.b * 2)  # noqa: E731
    got = (
        parallelize(sdf).groupby("a").parallel_apply(func)
        .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    expected = (
        pdf.assign(b2=pdf.b * 2).sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["a", "b", "c", "b2"]], expected[["a", "b", "c", "b2"]], check_dtype=False
    )


def test_explicit_schema_skips_inference(spark, sdf):
    got = (
        parallelize(sdf)
        .groupby("a")
        .parallel_apply(
            lambda g: float(g.b.sum()),
            schema="a bigint, result double",
            mode="scalar",
        )
        .count()
    )
    assert got == 99 or got > 0


def test_none_returning_mutator_raises_clearly(spark, sdf):
    """pandas yields an EMPTY result for None-returning (in-place
    mutating) funcs; the engine fails loudly with the fix spelled out
    instead of emitting junk (reference mutation detection,
    dataframe_groupby.py:37, served pandas 1.x conventions)."""
    import pytest as _pytest

    def mutate_in_place(g):
        g["b2"] = g.b * 2

    with _pytest.raises(ValueError, match="mutating it in place"):
        parallelize(sdf).groupby("a").parallel_apply(mutate_in_place)
