"""int8 embedding storage codec (operators/embedding_codec.py):
symmetric per-vector scalar quantization. Pinned: the half-step error
bound, cosine preservation, zero-vector/NULL handling, numpy
differential for the exact rint arithmetic, and the pure-projection
plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandarallel_spark.operators.embedding_codec import (
    dequantize_embeddings,
    quantization_error,
    quantize_embeddings,
)


def _corpus(spark, n=200, dim=64, seed=23):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    rows.append((n, [0.0] * dim))  # zero vector
    rows.append((n + 1, None))     # NULL vector
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ), rows


def test_roundtrip_error_bound_and_numpy_differential(spark):
    df, rows = _corpus(spark)
    enc = quantize_embeddings(df, "embedding", drop_input=False)
    assert "embedding_i8" in enc.columns and "embedding_scale" in enc.columns
    got = {r["vec_id"]: r for r in enc.collect()}

    for i, vec in rows:
        r = got[i]
        if vec is None:
            assert r["embedding_i8"] is None and r["embedding_scale"] is None
            continue
        arr = np.array(vec)
        scale = float(np.max(np.abs(arr))) if len(arr) else 0.0
        assert r["embedding_scale"] == pytest.approx(scale)
        if scale == 0.0:
            assert all(c == 0 for c in r["embedding_i8"])
            continue
        # exact arithmetic differential: rint (banker's rounding in
        # BOTH numpy and the JVM's Math.rint)
        want = np.rint(arr / scale * 127.0).astype("int8")
        assert list(r["embedding_i8"]) == [int(x) for x in want]

    # the error expression certifies the half-step bound row-by-row
    errs = enc.select(
        "embedding_scale",
        quantization_error(
            enc, "embedding", "embedding_i8", "embedding_scale"
        ).alias("e"),
    ).collect()
    for r in errs:
        if r["embedding_scale"] is None:
            continue
        bound = r["embedding_scale"] / 254.0 + 1e-12
        assert r["e"] <= bound, (r["e"], bound)


def test_dequantize_preserves_cosine_and_is_a_projection(spark):
    df, rows = _corpus(spark, n=100)
    enc = quantize_embeddings(df, "embedding")
    assert "embedding" not in enc.columns  # storage form drops floats
    dec = dequantize_embeddings(
        enc, "embedding_i8", "embedding_scale", "embedding"
    )
    got = {r["vec_id"]: r["embedding"] for r in dec.collect()}
    for i, vec in rows[:100]:
        a, b = np.array(vec), np.array(got[i])
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, (i, cos)

    # pure projections: no shuffle, no Python in the encode+decode plan
    from pandarallel_spark.plans import scale_audit

    aud = scale_audit(dec)
    assert aud.exchanges == 0 and aud.python_free

    # float output dtype option
    decf = dequantize_embeddings(
        enc, "embedding_i8", "embedding_scale", "emb32", dtype="float"
    )
    assert dict(decf.dtypes)["emb32"] == "array<float>"


def test_codec_validation(spark):
    df, _ = _corpus(spark, n=5)
    with pytest.raises(ValueError, match="already exists"):
        quantize_embeddings(
            df.withColumn("embedding_i8", F.lit(1)), "embedding"
        )
    enc = quantize_embeddings(df, "embedding")
    with pytest.raises(ValueError, match="already exists"):
        dequantize_embeddings(
            enc.withColumn("x", F.lit(1)), "embedding_i8",
            "embedding_scale", "x",
        )
    with pytest.raises(ValueError, match="dtype must be"):
        dequantize_embeddings(
            enc, "embedding_i8", "embedding_scale", "v", dtype="int"
        )
