"""Planning helpers: schema inference for UDF outputs, order reification,
physical-plan scale auditing."""

from pandarallel_spark.plans.audit import ScaleAudit, scale_audit, scale_report
from pandarallel_spark.plans.ordering import with_row_id
from pandarallel_spark.plans.schema import (
    infer_schema_from_pandas,
    pandas_dtype_to_spark,
)

__all__ = [
    "ScaleAudit",
    "scale_audit",
    "scale_report",
    "with_row_id",
    "infer_schema_from_pandas",
    "pandas_dtype_to_spark",
]
