"""Reusable Column-expression builders (JVM-side, codegen-friendly).

The reference has no scalar-function library of its own (SURVEY.md
§2.2) — UDF bodies use stdlib ``math``. Everything here is built from
``pyspark.sql.functions`` so it never leaves the JVM.
"""

from pandarallel_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = ["cosine_similarity", "dot", "l2_norm"]
