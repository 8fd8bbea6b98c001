"""Output-schema inference for pandas UDFs.

The reference never declares schemas: its reduce step sniffs the first
worker result at runtime (``data_types/dataframe.py:50`` checks
``isinstance(datas[0], pd.Series)``). Spark's ``applyInPandas`` /
``mapInPandas`` need the schema *before* execution, so this module closes
the gap the way pandas-on-Spark does for its apply family: run the UDF on
a small driver-side sample and map the resulting pandas dtypes to Spark
types (SURVEY.md §1.2). Callers can always pass an explicit schema to
skip sampling — that is the recommended production path, since sampling
costs one extra (pushdown-friendly, ``limit``-ed) job.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import types as T

_NUMPY_TO_SPARK: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    # uint64 deliberately absent: it has no lossless signed home —
    # declaring bigint silently corrupted values above 2^63-1 (hash
    # outputs routinely live there; review finding r4). Handled below
    # with an explicit error.
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "datetime64[ns]": T.TimestampType(),
    "datetime64[us]": T.TimestampType(),
    "timedelta64[ns]": T.DayTimeIntervalType(),
    "object": T.StringType(),
    "string": T.StringType(),
}


def pandas_dtype_to_spark(dtype: Any, sample: Any = None) -> T.DataType:
    """Map a pandas/numpy dtype (plus an optional sample value for
    object columns) to a Spark type."""
    name = str(dtype)
    if name in _NUMPY_TO_SPARK and name != "object":
        return _NUMPY_TO_SPARK[name]
    if name == "uint64":
        raise TypeError(
            "uint64 output has no lossless Spark type (bigint is signed; "
            "values ≥ 2^63 — e.g. 64-bit hashes — would corrupt silently): "
            "cast to int64 if the values fit, or to string/decimal"
        )
    if name.startswith("datetime64"):
        return T.TimestampType()
    # object dtype: look at a concrete value
    if sample is not None and not (isinstance(sample, float) and np.isnan(sample)):
        return _python_value_to_spark(sample)
    return T.StringType()


def _python_value_to_spark(value: Any) -> T.DataType:
    import decimal

    if isinstance(value, bool) or isinstance(value, np.bool_):
        return T.BooleanType()
    if isinstance(value, decimal.Decimal):
        # widest Spark decimal that still keeps 18 fractional digits;
        # callers needing an exact precision pass an explicit schema
        return T.DecimalType(38, 18)
    if isinstance(value, (int, np.integer)):
        return T.LongType()
    if isinstance(value, (float, np.floating)):
        return T.DoubleType()
    if isinstance(value, bytes):
        return T.BinaryType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (list, tuple, np.ndarray)):
        elem = value[0] if len(value) else None
        elem_t = _python_value_to_spark(elem) if elem is not None else T.StringType()
        return T.ArrayType(elem_t)
    if isinstance(value, dict):
        if value:
            k, v = next(iter(value.items()))
            return T.MapType(_python_value_to_spark(k), _python_value_to_spark(v))
        return T.MapType(T.StringType(), T.StringType())
    return T.StringType()


def infer_schema_from_pandas(pdf: pd.DataFrame) -> T.StructType:
    """Spark StructType matching a pandas DataFrame's dtypes."""
    fields = []
    for col in pdf.columns:
        series = pdf[col]
        sample = None
        non_null = series.dropna()
        if len(non_null):
            sample = non_null.iloc[0]
        fields.append(T.StructField(str(col), pandas_dtype_to_spark(series.dtype, sample), True))
    return T.StructType(fields)


# (A standalone infer_udf_output(sample, func) helper used to live here;
# operators/groupby.grouped_apply inlines the same frame/series/scalar
# classification with extra None-result and pinned-mode handling, and
# the unused copy had drifted — removed rather than kept as dead code.)
