"""Embedding STORAGE codec: symmetric int8 scalar quantization with a
per-vector scale — the standard way to keep a 100 TB embedding corpus
on disk at 4× reduction (float32 → int8 + one float), orthogonal to
the PQ SEARCH compression in ``similarity.py`` (PQ codes answer
queries; this codec stores vectors you'll decode again — reranking
pools, training features, downstream fine-tunes).

Pure JVM end to end: encode is ``max(|x|)`` via one ``aggregate`` +
``transform`` round-to-nearest per element, decode one ``transform`` —
both ride the scan as projections, no Python, no shuffle, valid inside
any larger plan (write-time encode, read-time decode).

Guarantees (pytest-pinned):
- round-trip error per element ≤ scale/127/2 (half a quantization
  step) — the symmetric-quantization bound;
- cosine similarity is preserved to ~1e-2 at dim ≥ 64 (normalized
  vectors spread error across dims);
- zero vectors round-trip exactly (scale 0 encodes all-zero codes and
  decodes to zeros, never NaN);
- decode(encode(x)) is deterministic and engine-independent (the
  arithmetic is plain IEEE doubles + rint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    vec_col: str,
    code_col: str | None = None,
    scale_col: str | None = None,
    drop_input: bool = True,
) -> DataFrame:
    """Add int8 codes + a per-vector scale for ``vec_col``:
    ``code[i] = rint(x[i] / scale * 127)`` with ``scale = max(|x|)``
    (symmetric linear quantization — no zero-point, so 0.0 encodes
    exactly and the sign structure survives). Output columns:
    ``{vec}_i8 array<tinyint>`` and ``{vec}_scale double``; the float
    column is dropped by default (keeping both defeats the storage
    point — pass ``drop_input=False`` for side-by-side validation).

    Storage math: a 1024-dim float32 vector is 4 KB; its code form is
    1 KB + 8 B — ~4× fewer bytes scanned by every downstream read.
    Parquet byte arrays also RLE/dictionary-compress better than
    floats. NULL vectors stay NULL in both output columns."""
    code_col = code_col or f"{vec_col}_i8"
    scale_col = scale_col or f"{vec_col}_scale"
    for c in (code_col, scale_col):
        if c in df.columns:
            raise ValueError(
                f"column {c!r} already exists — pass code_col=/scale_col="
            )
    v = F.col(vec_col)
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    out = df.withColumn(scale_col, scale).withColumn(
        code_col,
        F.transform(
            v,
            lambda x: F.when(
                F.col(scale_col) > 0,
                F.rint(x.cast("double") / F.col(scale_col) * F.lit(127.0)),
            )
            .otherwise(F.lit(0.0))
            .cast("tinyint"),
        ),
    )
    return out.drop(vec_col) if drop_input else out


def dequantize_embeddings(
    df: DataFrame,
    code_col: str,
    scale_col: str,
    vec_col: str,
    dtype: str = "double",
) -> DataFrame:
    """Reconstruct ``vec_col`` from codes + scale:
    ``x[i] ≈ code[i] * scale / 127`` — one ``transform`` projection.
    ``dtype`` picks the element type (``"double"`` default, ``"float"``
    to match a float32 pipeline). The codes/scale columns are kept (a
    reader that dequantizes for one consumer usually still writes the
    compact form onward); drop them explicitly if not."""
    if dtype not in ("double", "float"):
        raise ValueError(f"dtype must be 'double' or 'float', got {dtype!r}")
    if vec_col in df.columns:
        raise ValueError(
            f"column {vec_col!r} already exists — pass a fresh output name"
        )
    return df.withColumn(
        vec_col,
        F.transform(
            F.col(code_col),
            lambda c: (
                c.cast("double") * F.col(scale_col) / F.lit(127.0)
            ).cast(dtype),
        ),
    )


def quantization_error(
    df: DataFrame, vec_col: str, code_col: str, scale_col: str
) -> Column:
    """Max absolute element-wise reconstruction error for a row —
    the validation expression (pair with ``quantize_embeddings(...,
    drop_input=False)``): must be ≤ ``scale/254`` + float noise, the
    half-step bound the codec guarantees."""
    recon = F.transform(
        F.col(code_col),
        lambda c: c.cast("double") * F.col(scale_col) / F.lit(127.0),
    )
    return F.aggregate(
        F.zip_with(
            F.col(vec_col), recon, lambda a, b: F.abs(a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
