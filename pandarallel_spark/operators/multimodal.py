"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.3).

Media travel as opaque ``binary`` columns with a typed metadata struct —
the lakehouse-standard layout (content + media_type + width/height/
duration). The Spark-side machinery here is real and tested: schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partition sizing. The
codec: ``decode_image`` REALLY decodes binary PPM (P6) and uncompressed
24-bit BMP with numpy alone (pytest-verified on real byte payloads);
formats that need an entropy decoder (JPEG/PNG — no PIL/ffmpeg in this
container) fall back to a clearly-marked deterministic sha256 stub, or
raise under ``require_real_codec=True``. Swapping in a full decoder
changes one function, not the pipeline.

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
    pseudo-features. Used for payloads no real decoder here accepts."""
    digest = hashlib.sha256(content).digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype("float32")


def decode_image(content: bytes) -> np.ndarray | None:
    """numpy-only image decode for two trivial PUBLIC formats — binary
    PPM ("P6", the netpbm spec) and uncompressed 24-bit BMP (Windows
    BITMAPINFOHEADER). Returns an (H, W, 3) uint8 array, or None when
    the payload isn't one of these (caller decides fake vs raise).
    Formats needing an entropy decoder (JPEG/PNG) stay out of scope in
    this container — the point is a REAL byte-level decode path proving
    the binary-column plumbing end to end."""
    if content[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB
        # '#' comments run to end of line anywhere in the header
        pos, fields = 2, []
        while len(fields) < 3 and pos < len(content):
            c = content[pos:pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = content.find(b"\n", pos)
                pos = len(content) if nl < 0 else nl + 1
            elif c.isdigit():
                end = pos
                while end < len(content) and content[end:end + 1].isdigit():
                    end += 1
                fields.append(int(content[pos:end]))
                pos = end
            else:
                return None
        if len(fields) < 3 or not content[pos:pos + 1].isspace():
            return None
        w, h, maxval = fields
        pos += 1  # exactly ONE whitespace separates header from raster
        if maxval != 255 or w <= 0 or h <= 0:
            return None  # 2-byte samples (maxval>255) not supported
        need = w * h * 3
        if len(content) - pos < need:
            return None
        return (
            np.frombuffer(content, dtype=np.uint8, count=need, offset=pos)
            .reshape(h, w, 3)
            .copy()
        )
    if content[:2] == b"BM" and len(content) >= 54:
        off = int.from_bytes(content[10:14], "little")
        hdr_size = int.from_bytes(content[14:18], "little")
        if hdr_size < 40:
            return None
        w = int.from_bytes(content[18:22], "little", signed=True)
        h = int.from_bytes(content[22:26], "little", signed=True)
        bpp = int.from_bytes(content[28:30], "little")
        compression = int.from_bytes(content[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        if len(content) < off + stride * h:
            return None
        rows = np.frombuffer(
            content, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]  # BMP default is bottom-up
        return rows[:, :, ::-1].copy()  # BGR → RGB
    return None


def image_features(img: np.ndarray, out_dim: int) -> np.ndarray:
    """Decoded pixels → fixed-length features: luma grayscale, nearest-
    neighbor sample onto a ⌈√out_dim⌉² grid, scaled to [0, 1]. Exact
    integer-index sampling → deterministic across platforms."""
    gray = (
        0.299 * img[:, :, 0].astype("float64")
        + 0.587 * img[:, :, 1].astype("float64")
        + 0.114 * img[:, :, 2].astype("float64")
    )
    h, w = gray.shape
    g = int(np.ceil(np.sqrt(out_dim)))
    ys = ((np.arange(g) + 0.5) * h / g).astype("int64").clip(0, h - 1)
    xs = ((np.arange(g) + 0.5) * w / g).astype("int64").clip(0, w - 1)
    grid = gray[np.ix_(ys, xs)].ravel()[:out_dim]
    return (grid / 255.0).astype("float32")


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    out_dim: int = 16,
    require_real_codec: bool = False,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Binary → fixed-length feature vector via ``mapInPandas``.

    Per payload: a REAL decode (``decode_image`` — PPM/BMP, numpy-only)
    feeds ``image_features`` when the format is supported; other
    payloads get the deterministic sha256 stub so the distributed
    plumbing stays testable against arbitrary bytes. With
    ``require_real_codec=True``, undecodable payloads raise ``ValueError``
    (the honest production behavior) instead of falling back. A
    ``decoded`` boolean reports which path served each row.
    ``passthrough`` columns (already-computed, e.g. a JVM-side digest)
    ride the Arrow batch unchanged — cheaper than a post-hoc join back
    on media_id, which would add a shuffle at scale.
    Output: (media_id, n_bytes, decoded, features, *passthrough).
    """
    passthrough = list(passthrough or [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, decoded = [], []
            for c in pdf[content_col]:
                raw = bytes(c)
                img = decode_image(raw)
                decoded.append(img is not None)
                if img is not None:
                    feats.append(image_features(img, out_dim).tolist())
                elif require_real_codec:
                    raise ValueError(
                        f"payload ({raw[:8]!r}...) is not a decodable "
                        "PPM/BMP and require_real_codec=True"
                    )
                else:
                    feats.append(_fake_decode(raw, out_dim).tolist())
            out = {
                "media_id": pdf[id_col].to_numpy(),
                "n_bytes": pdf[content_col].apply(len).astype("int64"),
                "decoded": decoded,
                "features": feats,
            }
            for p in passthrough:
                out[p] = pdf[p].to_numpy()
            yield pd.DataFrame(out)

    extra_ddl = "".join(
        f", {p} {df.schema[p].dataType.simpleString()}" for p in passthrough
    )
    # media_id keeps the caller's id type (bigint for the synthetic
    # media table, string paths for binaryFile ingestion)
    id_ddl = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, content_col, *passthrough).mapInPandas(
        run,
        f"media_id {id_ddl}, n_bytes bigint, decoded boolean, "
        f"features array<float>{extra_ddl}",
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
