"""Planning helpers: schema inference for UDF outputs, order reification."""

from pandarallel_spark.plans.ordering import with_row_id
from pandarallel_spark.plans.schema import (
    infer_schema_from_pandas,
    pandas_dtype_to_spark,
)

__all__ = [
    "with_row_id",
    "infer_schema_from_pandas",
    "pandas_dtype_to_spark",
]
