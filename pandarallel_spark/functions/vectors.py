"""Vector math over ``array<float>`` columns as pure Column expressions.

``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside codegen —
no Python worker round-trip for a dot product over an embedding column.
Used by the similarity operators; the brute-force cosine top-k baseline
is exactly ``cosine_similarity`` + a ranking window.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sum, all JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
