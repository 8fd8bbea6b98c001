"""Differential tests for apply operators — the reference's own strategy
(SURVEY.md §5): compute with stock pandas on the same rows, assert
equality. Dimensions ported from tests/test_pandarallel.py: scalar vs
frame UDF returns, 1-row and empty inputs, args/kwargs forwarding,
invalid-axis error.
"""

import math

import pandas as pd
import pandas.testing as pdt
import pytest
from pyspark.sql import functions as F

from pandarallel_spark import parallelize


@pytest.fixture(scope="module")
def pdf():
    # F2 fixture: two-column numeric frame
    import numpy as np

    rng = np.random.default_rng(42)
    return pd.DataFrame(
        {"a": rng.integers(1, 8, 1000), "b": rng.random(1000)}
    )


@pytest.fixture(scope="module")
def sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def _sorted(df, by):
    return df.sort_values(by).reset_index(drop=True)


def test_apply_rows_scalar(spark, pdf, sdf):
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    expected = pdf.assign(result=pdf.apply(func, axis=1))
    got = parallelize(sdf).parallel_apply(func, axis=1).toPandas()
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))


def test_apply_rows_expression_fast_path(spark, pdf, sdf):
    got = (
        parallelize(sdf)
        .parallel_apply(F.sin(F.col("a") ** 2) + F.sin(F.col("b") ** 2), axis=1)
        .toPandas()
    )
    func = lambda row: math.sin(row.a**2) + math.sin(row.b**2)  # noqa: E731
    expected = pdf.assign(result=pdf.apply(func, axis=1))
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))


def test_apply_rows_series_return(spark, pdf, sdf):
    func = lambda row: pd.Series({"x2": row.a * 2, "y2": row.b * 2})  # noqa: E731
    expected = pd.concat([pdf, pdf.apply(func, axis=1)], axis=1)
    got = parallelize(sdf).parallel_apply(func, axis=1).toPandas()
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))


def test_apply_columns_reduce(spark, pdf, sdf):
    func = lambda col: col.max() - col.min()  # noqa: E731  (reference test :31-35)
    expected = pdf.apply(func, axis=0)
    got = parallelize(sdf).parallel_apply(func, axis=0).toPandas()
    assert got.shape == (1, 2)
    assert got["a"].iloc[0] == expected["a"]
    assert got["b"].iloc[0] == pytest.approx(expected["b"])


def test_apply_columns_transform(spark, pdf, sdf):
    func = lambda col: col * 2  # noqa: E731  (identity-shaped, reference :145-149)
    expected = pdf.apply(func, axis=0)
    got = parallelize(sdf).parallel_apply(func, axis=0, elementwise=True).toPandas()
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))


def test_apply_columns_transform_autodetected(spark, pdf, sdf):
    """Reference auto-sniffs transform-vs-reduce at reduce time
    (data_types/dataframe.py:44-51; transform test shapes
    tests/test_pandarallel.py:145-157) — no elementwise flag needed."""
    func = lambda col: col * 2  # noqa: E731
    expected = pdf.apply(func, axis=0)
    got = parallelize(sdf).parallel_apply(func, axis=0).toPandas()
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))
    # identity transform (reference :151-157)
    ident = parallelize(sdf).parallel_apply(lambda col: col, axis=0).toPandas()
    pdt.assert_frame_equal(_sorted(ident, ["a", "b"]), _sorted(pdf, ["a", "b"]))


def test_applymap(spark, pdf, sdf):
    func = lambda x: x**2 - x  # noqa: E731  (reference :229-237 shape)
    expected = pdf.map(func)
    got = parallelize(sdf).parallel_applymap(func).toPandas()
    pdt.assert_frame_equal(_sorted(got, ["a", "b"]), _sorted(expected, ["a", "b"]))


def test_single_row(spark):
    pdf1 = pd.DataFrame({"a": [3], "b": [0.5]})
    sdf1 = spark.createDataFrame(pdf1)
    func = lambda row: row.a + row.b  # noqa: E731
    got = parallelize(sdf1).parallel_apply(func, axis=1).toPandas()
    assert got["result"].iloc[0] == pytest.approx(3.5)


def test_empty_frame(spark):
    pdf0 = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="float64")})
    sdf0 = spark.createDataFrame(pdf0, schema="a bigint, b double")
    func = lambda row: row.a + row.b  # noqa: E731
    got = parallelize(sdf0).parallel_apply(func, axis=1, schema="a bigint, b double, result double").toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["a", "b", "result"]


def test_invalid_axis(spark, sdf):
    with pytest.raises(ValueError):
        parallelize(sdf).parallel_apply(lambda r: r, axis="invalid")


def test_exception_transparency(spark, sdf):
    # reference tests/test_pandarallel.py:167-174: worker exception type
    # must surface to the caller. Spark wraps it in PythonException with
    # the original traceback embedded.
    def boom(row):
        raise ZeroDivisionError("boom")

    with pytest.raises(Exception, match="ZeroDivisionError"):
        parallelize(sdf).parallel_apply(boom, axis=1, schema="a bigint, b double, result double").collect()


def test_row_apply_vectorized_matches_per_row(spark):
    """The batch-vectorized row-UDF fast path must agree with the
    per-row loop for arithmetic funcs, reject non-elementwise funcs
    (shape/exception), and honor vectorize=False."""
    import math

    import numpy as np

    from pandarallel_spark import parallelize

    n = 20_000
    pdf = pd.DataFrame(
        {"a": np.arange(n, dtype="int64"), "b": np.random.default_rng(2).random(n)}
    )
    sdf = spark.createDataFrame(pdf).repartition(8)
    schema = "a bigint, b double, result double"

    arith = lambda row: round(row["b"] * 100) * (100 - row["a"] % 7) / 10000.0  # noqa: E731
    exp = pdf.apply(arith, axis=1)
    for flag in (True, False):
        got = (
            parallelize(sdf)
            .parallel_apply(arith, axis=1, schema=schema, vectorize=flag)
            .toPandas()
            .sort_values("a", ignore_index=True)
        )
        assert np.array_equal(got["result"].to_numpy(), exp.to_numpy()), flag

    # math.* raises on Series -> per-row fallback, still correct
    mfunc = lambda row: math.sin(row["b"])  # noqa: E731
    got = (
        parallelize(sdf)
        .parallel_apply(mfunc, axis=1, schema=schema)
        .toPandas()
        .sort_values("a", ignore_index=True)
    )
    assert np.array_equal(got["result"].to_numpy(), pdf.apply(mfunc, axis=1).to_numpy())

    # whole-frame reduction returns a scalar -> wrong shape -> fallback
    # (row-wise it's a row reduction, still a valid per-row scalar)
    rfunc = lambda row: float(row.sum())  # noqa: E731
    got = (
        parallelize(sdf)
        .parallel_apply(rfunc, axis=1, schema=schema)
        .toPandas()
        .sort_values("a", ignore_index=True)
    )
    assert np.allclose(got["result"].to_numpy(), pdf.apply(rfunc, axis=1).to_numpy(), rtol=0, atol=0)


def test_row_apply_vectorized_actually_engages(spark):
    """A sentinel UDF that refuses to run per-row more than the sampled
    handful proves the batch path executed (output equality alone stays
    green when the fast path silently dies)."""
    import numpy as np

    from pandarallel_spark import parallelize

    n = 20_000
    pdf = pd.DataFrame({"a": np.arange(n, dtype="int64"), "b": np.arange(n) * 0.5})
    sdf = spark.createDataFrame(pdf).repartition(8)

    def guarded(row, _counter=[]):
        if isinstance(row, pd.Series):  # per-row (scalar) call
            _counter.append(1)
            assert len(_counter) <= 100, "fast path did not engage"
        return row["b"] * 2 + 1

    got = (
        parallelize(sdf)
        .parallel_apply(guarded, axis=1, schema="a bigint, b double, result double")
        .toPandas()
        .sort_values("a", ignore_index=True)
    )
    assert np.array_equal(got["result"].to_numpy(), (pdf["b"] * 2 + 1).to_numpy())


def test_row_apply_mutating_udf_cannot_corrupt_passthrough(spark):
    """A UDF that mutates its argument must not corrupt the passthrough
    columns (batch call gets a private copy)."""
    import numpy as np

    from pandarallel_spark import parallelize

    n = 10_000
    pdf = pd.DataFrame({"a": np.arange(n, dtype="int64"), "b": np.ones(n)})
    sdf = spark.createDataFrame(pdf).repartition(4)

    def mutator(row):
        row["b"] = row["b"] * 2  # mutation: UB in pandas, must stay contained
        return row["b"] + 1.0

    got = (
        parallelize(sdf)
        .parallel_apply(mutator, axis=1, schema="a bigint, b double, result double")
        .toPandas()
        .sort_values("a", ignore_index=True)
    )
    assert (got["b"] == 1.0).all()  # passthrough column untouched
    assert (got["result"] == 3.0).all()


def test_row_apply_big_int_rejects_vectorization(spark):
    """Integral outputs beyond 2^53 must not silently lose precision on
    the float64-validated fast path — vectorize=True and =False agree."""
    import numpy as np

    from pandarallel_spark import parallelize

    base = (1 << 60) + 1
    pdf = pd.DataFrame({"a": np.arange(1000, dtype="int64") + base})
    sdf = spark.createDataFrame(pdf).repartition(2)
    f = lambda row: row["a"] + 1  # noqa: E731
    outs = {}
    for flag in (True, False):
        outs[flag] = (
            parallelize(sdf)
            .parallel_apply(f, axis=1, schema="a bigint, result bigint", vectorize=flag)
            .toPandas()
            .sort_values("a", ignore_index=True)["result"]
            .to_numpy()
        )
    assert np.array_equal(outs[True], outs[False])
    assert outs[True][0] == base + 1


def test_applymap_vectorized_engages_and_matches(spark):
    """Per-column batch evaluation for applymap: sentinel proves the
    fast path ran; math.* funcs still fall back correctly."""
    import math

    import numpy as np

    from pandarallel_spark import parallelize

    n = 20_000
    pdf = pd.DataFrame({"a": np.arange(n) * 0.25, "b": np.arange(n) * 0.5})
    sdf = spark.createDataFrame(pdf).repartition(8)

    def guarded(x, _counter=[]):
        if np.isscalar(x) or isinstance(x, float):
            _counter.append(1)
            assert len(_counter) <= 100, "applymap fast path did not engage"
        return x * 2 + 1

    from pyspark.sql import types as T

    # explicit schema: driver-side inference would run the func on a
    # sample and ship the polluted _counter default inside the pickle
    got = (
        parallelize(sdf)
        .parallel_applymap(guarded, schema=T.StructType.fromDDL("a double, b double"))
        .toPandas().sort_values("a", ignore_index=True)
    )
    assert np.array_equal(got["a"].to_numpy(), (pdf["a"] * 2 + 1).to_numpy())
    assert np.array_equal(got["b"].to_numpy(), (pdf["b"] * 2 + 1).to_numpy())

    mfunc = lambda x: math.sin(x * x) - math.cos(x * x)  # noqa: E731
    got = (
        parallelize(sdf).parallel_applymap(mfunc)
        .toPandas().sort_values(["a", "b"], ignore_index=True)
    )
    exp = pdf.map(mfunc).sort_values(["a", "b"], ignore_index=True)
    assert np.array_equal(got["a"].to_numpy(), exp["a"].to_numpy())
    assert np.array_equal(got["b"].to_numpy(), exp["b"].to_numpy())


def test_decimal_outputs_never_vectorize(spark):
    """DecimalType outputs demand exactness float64 can't carry — the
    fast path must reject them so vectorize=True == vectorize=False
    (review regression: 17-sig-digit decimals were silently rounded)."""
    from decimal import Decimal

    from pandarallel_spark import parallelize

    from pyspark.sql import types as T

    rows = [(Decimal("12345678901234567.89"),), (Decimal("0.01"),)]
    sdf = spark.createDataFrame(rows, "d decimal(38,2)").repartition(2)
    f = lambda x: x * 2  # noqa: E731
    schema = T.StructType.fromDDL("d decimal(38,2)")
    outs = {}
    for flag in (True, False):
        outs[flag] = sorted(
            r["d"]
            for r in parallelize(sdf)
            .parallel_applymap(f, schema=schema, vectorize=flag)
            .collect()
        )
    assert outs[True] == outs[False]
    assert outs[True][1] == Decimal("24691357802469135.78")


def test_apply_columns_builtin_routes_to_jvm_agg(spark, pdf, sdf):
    """String builtins skip the column gather entirely: map-side partial
    aggregation, no Python (VERDICT r2 #5)."""
    got = parallelize(sdf).parallel_apply("max", axis=0).toPandas()
    assert got["a"].iloc[0] == pdf.a.max()
    assert got["b"].iloc[0] == pytest.approx(pdf.b.max())
    import io
    from contextlib import redirect_stdout

    from pandarallel_spark.operators.apply import apply_columns

    buf = io.StringIO()
    with redirect_stdout(buf):
        apply_columns(sdf, "max").explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "AggregateInPandas" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_apply_columns_args_kwargs_forwarded(spark, pdf, sdf):
    """args/kwargs forwarding on axis=0, reference core.py:212-213."""
    func = lambda col, p, bias=0: col.max() ** p + bias  # noqa: E731
    expected = pdf.apply(func, axis=0, args=(2,), bias=3)
    got = parallelize(sdf).parallel_apply(func, axis=0, args=(2,), bias=3).toPandas()
    assert got["a"].iloc[0] == expected["a"]
    assert got["b"].iloc[0] == pytest.approx(expected["b"])


def test_apply_columns_order_dependent_transform_rejected(spark, sdf):
    """cumsum-style transforms would silently restart at Arrow batch
    boundaries under per-batch evaluation — auto-detection must reject
    them loudly (review regression)."""
    with pytest.raises(ValueError, match="batch-stable"):
        parallelize(sdf).parallel_apply(lambda col: col.cumsum(), axis=0)


def test_apply_columns_mixed_mode_rejected(spark):
    """A func that transforms one column but reduces another (dtype-
    dependent behavior) must be caught per column, not guessed from
    columns[0] (review finding r3)."""
    import numpy as np

    pdf = pd.DataFrame(
        {"a": np.arange(50, dtype="int64"), "b": np.arange(50, dtype="float64")}
    )
    sdf2 = spark.createDataFrame(pdf)
    from pandarallel_spark.operators.apply import apply_columns

    def dtype_dependent(s):
        return s * 2 if s.dtype.kind == "i" else float(s.sum())

    with pytest.raises(ValueError, match="transform on .* reduce on"):
        apply_columns(sdf2, dtype_dependent)


def test_apply_columns_probe_error_names_column(spark):
    """A func that raises on one column's dtype fails at build time with
    the column named and guidance toward elementwise=/columns=."""
    pdf = pd.DataFrame({"num": [1.0, 2.0], "txt": ["x", "y"]})
    sdf2 = spark.createDataFrame(pdf)
    from pandarallel_spark.operators.apply import apply_columns

    with pytest.raises(ValueError, match="column 'txt'.*elementwise"):
        apply_columns(sdf2, lambda s: s * 2.5)
