"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.3).

Media travel as opaque ``binary`` columns with a typed metadata struct —
the lakehouse-standard layout (content + media_type + width/height/
duration). The Spark-side machinery here is real and tested: schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partition sizing. The
actual codec step is STUBBED — this container has no image/audio
libraries — behind ``try: import PIL`` with a clearly-marked
deterministic fake, so swapping in a real decoder changes one function,
not the pipeline.

Scale notes: binary payloads dominate batch bytes, so decode stages cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in session.py) and
should repartition by size, not row count, upstream. Feature outputs are
fixed-length float arrays → columnar-friendly, joinable to the
similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, media_type string, content binary, "
    "meta struct<orig_width:int, orig_height:int, n_bytes:bigint>"
)

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text column: content bytes =
    utf-8 payload, metadata derived from content length. Stands in for a
    real binary ingest (s3 object column / parquet BYTE_ARRAY)."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        content.alias("content"),
        F.struct(
            (F.length(content) % 640 + 1).cast("int").alias("orig_width"),
            (F.length(content) % 480 + 1).cast("int").alias("orig_height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for decode→resize→embed: sha256-seeded
    pseudo-features. Replace with a real codec when PIL/ffmpeg exist."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype("float32")


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    out_dim: int = 16,
    require_real_codec: bool = False,
) -> DataFrame:
    """Binary → fixed-length feature vector via ``mapInPandas``.

    With ``require_real_codec=True`` and no codec installed this raises
    ``NotImplementedError`` (the honest production behavior); otherwise
    the deterministic fake keeps the distributed plumbing testable.
    Output: (media_id, n_bytes, features array<float>).
    """
    if require_real_codec and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL/pillow, not present in this container"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                _fake_decode(bytes(c), out_dim).tolist() for c in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].to_numpy(),
                    "n_bytes": pdf[content_col].apply(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run, "media_id bigint, n_bytes bigint, features array<float>"
    )


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize *plan*: compute target dimensions (aspect-preserving,
    longest side → max_side) from metadata, JVM-side. The pixel work
    would happen in the decode UDF; the planning stays declarative so
    Catalyst can prune media that are already small."""
    w, h = F.col("meta.orig_width"), F.col("meta.orig_height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(max_side) / longest).otherwise(F.lit(1.0))
    return df.withColumn(
        "resize_to",
        F.struct(
            F.ceil(w * scale).cast("int").alias("width"),
            F.ceil(h * scale).cast("int").alias("height"),
            (longest > max_side).alias("needs_resize"),
        ),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling *plan* over a media table: emits
    (media_id, frame_idx) rows for every_n-th frame, sized from metadata
    — demonstrates explode-based fan-out without touching codecs."""
    n_frames = (F.col("meta.n_bytes") / 1000).cast("int") + 1
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
