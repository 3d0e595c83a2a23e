"""Multimodal asset plumbing (north-rule "interleaved text + media").

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.ASSETS_SCHEMA). Image *metadata* decoding is REAL, stdlib-only:
``parse_image_dims`` reads dimensions/channels straight from PNG IHDR,
GIF logical-screen, and JPEG SOF0/1/2 headers — the fast-probe pattern a
100 TB pipeline uses to plan resize/batch stages without full decodes.
Full pixel decoding and the feature extractor remain STUBBED (no
PIL/libvips in this container):

- ``decode_image_meta`` parses real headers (``fake=True`` keeps the
  old deterministic stand-in for payloads that aren't real images)
- ``extract_features`` maps payload bytes -> float vector via a seeded
  numpy PRNG (stand-in for a CNN/CLIP embedding; Arrow batch in/out)
- ``sample_frames`` models video frame-sampling as offsets into the blob
- ``synth_assets`` emits REAL header-faithful containers (valid PNG
  signature+IHDR+CRC / JPEG SOI+SOF0 / GIF89a header; body bytes are
  md5-derived filler), fixed 256 bytes, dimensions derived from
  md5(media_ref) — so a DuckDB oracle recomputes the decoded metadata
  independently (VERDICT #1/#6)

Partitioning note for 100 TB: assets are written partitioned by
``mime`` and bucketed by ``asset_id`` so decode stages shuffle nothing;
``spark.sql.files.maxPartitionBytes`` bounds the per-task batch of blobs,
and mapInPandas streams one Arrow batch of payloads at a time so executor
memory holds O(batch), not O(partition).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

FEATURE_DIM = 64
ASSET_PAYLOAD_BYTES = 256  # synth containers are fixed-size by construction

IMAGE_META_DDL = "struct<width:int, height:int, channels:int, ok:boolean>"

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# real stdlib header parsing (PNG IHDR / GIF screen descriptor / JPEG SOFn)
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def parse_image_dims(payload: bytes) -> dict:
    """Width/height/channels from raw image bytes, pure stdlib.

    PNG: IHDR is the first chunk after the 8-byte signature — width and
    height are big-endian u32 at offsets 16/20, color type at 25.
    GIF: 'GIF87a'/'GIF89a' then little-endian u16 width/height.
    JPEG: walk marker segments from SOI until a SOF0/SOF1/SOF2 frame
    header; height/width are big-endian u16 at +5/+7, component count
    (channels) at +9.
    """
    p = payload or b""
    try:
        if p[:8] == PNG_SIG and p[12:16] == b"IHDR":
            w, h = struct.unpack(">II", p[16:24])
            return {"width": int(w), "height": int(h),
                    "channels": _PNG_CHANNELS.get(p[25], 0), "ok": True}
        if p[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", p[6:10])
            return {"width": int(w), "height": int(h), "channels": 3, "ok": True}
        if p[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(p) and p[i] == 0xFF:
                marker = p[i + 1]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack(">HH", p[i + 5 : i + 9])
                    return {"width": int(w), "height": int(h),
                            "channels": int(p[i + 9]), "ok": True}
                if 0xD0 <= marker <= 0xD9 or marker == 0x01:
                    i += 2  # standalone markers carry no length
                else:
                    i += 2 + struct.unpack(">H", p[i + 2 : i + 4])[0]
    except (struct.error, IndexError):
        pass
    return {"width": 0, "height": 0, "channels": 0, "ok": False}


def _seed_of(payload: bytes | None) -> int:
    if not payload:
        return 0
    return int.from_bytes(hashlib.md5(payload).digest()[:4], "big")


def decode_image_meta(payload: bytes | None, fake: bool = False) -> dict:
    """Image metadata: REAL stdlib header parse (parse_image_dims). The
    ``fake=True`` path keeps the old deterministic md5-seeded stand-in for
    payloads that aren't actual image containers (full pixel decode — not
    metadata — still needs PIL/libvips and stays out of scope here)."""
    if not payload:
        return {"width": 0, "height": 0, "channels": 0, "ok": False}
    if fake:
        s = _seed_of(payload)
        return {
            "width": 64 + s % 1920,
            "height": 64 + (s >> 8) % 1080,
            "channels": 3,
            "ok": True,
        }
    return parse_image_dims(payload)


def image_meta_udf(fake: bool = False):
    @F.pandas_udf(IMAGE_META_DDL)
    def _udf(payloads: pd.Series) -> pd.DataFrame:
        rows = [decode_image_meta(bytes(p) if p is not None else None, fake=fake)
                for p in payloads]
        return pd.DataFrame(rows)

    return _udf


def extract_features(df: DataFrame, payload_col: str = "payload",
                     dim: int = FEATURE_DIM) -> DataFrame:
    """payload -> float feature vector (Arrow-batched; numpy-vectorized
    PRNG fake standing in for a real vision encoder)."""

    @F.pandas_udf("array<float>")
    def features(payloads: pd.Series) -> pd.Series:
        out = []
        for p in payloads:
            seed = _seed_of(bytes(p) if p is not None else None)
            rng = np.random.RandomState(seed)
            v = rng.randn(dim).astype(np.float32)
            v /= np.linalg.norm(v) or 1.0
            out.append(v.tolist())
        return pd.Series(out)

    return df.withColumn("features", features(F.col(payload_col)))


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  n_frames: int = 4) -> DataFrame:
    """Video frame sampling modeled as evenly spaced byte offsets (a real
    impl would demux; the plumbing — explode to one row per frame with a
    frame_idx — is what the pipeline needs)."""
    size = F.length(F.col(payload_col))
    offsets = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (size * i / F.lit(n_frames)).cast("long"),
    )
    return df.withColumn("frame_offsets", offsets).select(
        "*", F.posexplode_outer("frame_offsets").alias("frame_idx", "frame_offset")
    ).drop("frame_offsets")


# ---------------------------------------------------------------------------
# synthetic asset payloads — real container headers, fixed 256 bytes
# ---------------------------------------------------------------------------

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _filler(hx: str, n: int) -> bytes:
    return (hx.encode("ascii") * (n // 32 + 1))[:n]


def synth_png(w: int, h: int, hx: str) -> bytes:
    """Valid PNG signature + IHDR (real CRC) + one IDAT-framed filler chunk
    + IEND; total exactly 256 bytes. Header-faithful: every field a
    dimension probe reads is real; the IDAT body is opaque filler."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    body = _filler(hx, ASSET_PAYLOAD_BYTES - 8 - 25 - 12 - 12)
    return PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", body) + _png_chunk(b"IEND", b"")


def synth_jpeg(w: int, h: int, hx: str) -> bytes:
    """SOI + SOF0 (real dims, 3 components) + COM filler + EOI; 256 bytes."""
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    com_data = _filler(hx, ASSET_PAYLOAD_BYTES - 2 - len(sof0) - 4 - 2)
    com = b"\xff\xfe" + struct.pack(">H", len(com_data) + 2) + com_data
    return b"\xff\xd8" + sof0 + com + b"\xff\xd9"


def synth_gif(w: int, h: int, hx: str) -> bytes:
    """GIF89a header + logical screen descriptor (real dims) + filler +
    trailer; 256 bytes."""
    head = b"GIF89a" + struct.pack("<HH", w, h) + b"\x70\x00\x00"
    return head + _filler(hx, ASSET_PAYLOAD_BYTES - len(head) - 1) + b"\x3b"


def asset_dims_of(media_ref: str) -> tuple[int, int, int]:
    """(width, height, mime_selector) from md5(media_ref) — the shared
    contract between the payload builder and the DuckDB oracle
    (width = 16 + hex[0:2], height = 16 + hex[2:4], sel = hex[4:6] % 3)."""
    hx = hashlib.md5(media_ref.encode("utf-8")).hexdigest()
    return 16 + int(hx[0:2], 16), 16 + int(hx[2:4], 16), int(hx[4:6], 16) % 3


@F.pandas_udf(T.BinaryType())
def _payload_udf(media_ref: pd.Series) -> pd.Series:
    builders = (synth_png, synth_jpeg, synth_gif)
    out = []
    for ref in media_ref:
        hx = hashlib.md5(str(ref).encode("utf-8")).hexdigest()
        w, h, sel = asset_dims_of(str(ref))
        out.append(builders[sel](w, h, hx))
    return pd.Series(out)


def synth_assets(spark, documents: DataFrame) -> DataFrame:
    """Deterministic asset table from a documents(doc_id, spans) table: one
    asset per media span; payload is a real 256-byte image container whose
    header dimensions derive from md5(media_ref) (asset_dims_of), so
    downstream decode results are independently recomputable in SQL."""

    media = documents.select(
        "doc_id", F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("sp")
    ).select(
        "doc_id", F.col("sp.media_ref").alias("media_ref"),
        F.col("sp.offset").alias("offset"),
    )

    sel = F.pmod(F.conv(F.substring(F.md5("media_ref"), 5, 2), 16, 10).cast("int"), F.lit(3))
    mime = (
        F.when(sel == 0, F.lit("image/png"))
        .when(sel == 1, F.lit("image/jpeg"))
        .otherwise(F.lit("image/gif"))
    )
    return media.select(
        F.concat("doc_id", F.lit("#"), F.col("offset").cast("string")).alias("asset_id"),
        "doc_id", "media_ref",
        mime.alias("mime"),
        _payload_udf(F.col("media_ref")).alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )
