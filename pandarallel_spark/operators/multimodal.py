"""Multimodal (image/audio/video) column plumbing (SURVEY.md §2.3).

Media travel as opaque ``binary`` columns with a typed metadata struct —
the lakehouse-standard layout (content + media_type + width/height/
duration). The Spark-side machinery here is real and tested: schemas,
Arrow batch shapes, ``mapInPandas`` signatures, partition sizing. The
codec: ``decode_image`` REALLY decodes binary PPM (P6), uncompressed
24-bit BMP, and 8-bit non-interlaced PNG (stdlib zlib inflate + numpy
scanline unfiltering — all five filters; pytest round-trip-verified
against an in-test encoder). JPEG, which needs a Huffman/DCT stack this
container lacks, falls back to a clearly-marked deterministic sha256
stub, or raises under ``require_real_codec=True``. Swapping in a full
decoder changes one function, not the pipeline.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes) -> np.ndarray | None:
    """Real PNG decode with stdlib ``zlib`` + numpy (r8 — closes the
    "entropy-coded formats are stubbed" gap for PNG; JPEG still needs a
    Huffman/DCT stack this container lacks). Spec coverage: 8-bit
    non-interlaced greyscale (0), RGB (2), palette (3), grey+alpha (4),
    RGBA (6); all five scanline filters (None/Sub/Up/Average/Paeth, RFC
    2083 §6). 16-bit and Adam7-interlaced images return None (caller
    decides stub vs raise). Chunk CRCs are not re-verified — the zlib
    stream's Adler-32 already integrity-checks the pixel data, which is
    what ``zlib.decompress`` enforces. Returns (H, W, 3) uint8; alpha
    is dropped, grey replicated.

    Filter notes: Up is fully vectorized (previous reconstructed row);
    Sub is a per-channel byte cumsum (vectorized — uint32 accumulator,
    wrap at the final uint8 cast); Average and Paeth carry a true
    left-pixel data dependency, so they run a per-byte loop within the
    scanline (rows stay independent of everything except the prior
    reconstructed row).
    """
    import zlib

    if content[:8] != _PNG_SIG:
        return None
    pos, ihdr, plte = 8, None, None
    idat_parts: list[bytes] = []
    while pos + 8 <= len(content):
        ln = int.from_bytes(content[pos:pos + 4], "big")
        typ = content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat_parts.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln  # data + 4B length/type each + 4B CRC (skipped)
    if ihdr is None or len(ihdr) < 13 or not idat_parts:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if w <= 0 or h <= 0 or bit_depth != 8 or interlace != 0:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None or (color_type == 3 and plte is None):
        return None
    try:
        raw = zlib.decompress(b"".join(idat_parts))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    lines = np.frombuffer(
        raw, dtype=np.uint8, count=h * (stride + 1)
    ).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub: per-channel byte cumsum, mod-256 wrap
            out[y] = (
                cur.reshape(w, bpp).astype(np.uint32).cumsum(axis=0)
                .astype(np.uint8).reshape(-1)
            )
        elif f == 2:  # Up
            out[y] = cur + prev  # uint8 add wraps mod 256
        elif f == 3:  # Average
            rec = out[y]
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = out[y]
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(cur[x]) + pred) & 0xFF
        else:
            return None
    px = out.reshape(h, w, channels)
    if color_type == 0:
        return np.repeat(px, 3, axis=2).copy()
    if color_type == 2:
        return px.copy()
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8)
        if len(pal) % 3:
            return None
        pal = pal.reshape(-1, 3)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            return None
        return pal[idx].copy()
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()  # RGBA → drop alpha


def decode_image(content: bytes) -> np.ndarray | None:
    """numpy-only image decode for three PUBLIC formats — binary
    PPM ("P6", the netpbm spec), uncompressed 24-bit BMP (Windows
    BITMAPINFOHEADER), and 8-bit non-interlaced PNG (via stdlib zlib +
    numpy unfiltering, ``decode_png``). Returns an (H, W, 3) uint8
    array, or None when the payload isn't one of these (caller decides
    fake vs raise). JPEG still needs an entropy/DCT stack this
    container lacks — the sha256 stub stands in there."""
    if content[:8] == _PNG_SIG:
        return decode_png(content)
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
                        "PPM/BMP/PNG and require_real_codec=True"
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
