"""Multimodal asset plumbing (north-rule "interleaved text + media").

Media payloads are opaque ``binary`` columns with typed metadata
(schemas.ASSETS_SCHEMA). The Spark-side machinery — schema, batching,
partition sizing, UDF signatures — is real and tested; the codec calls
themselves are STUBBED (image/audio libraries are not in this container):

- ``decode_image`` raises NotImplementedError unless ``fake=True``, in
  which case it produces a deterministic fake (seeded by payload hash) with
  the same output schema a real decoder would have
- ``extract_features`` maps payload bytes -> float vector via a seeded
  numpy PRNG (stand-in for a CNN/CLIP embedding; Arrow batch in/out)
- ``sample_frames`` models video frame-sampling as offsets into the blob

Partitioning note for 100 TB: assets are written partitioned by
``mime`` and bucketed by ``asset_id`` so decode stages shuffle nothing;
``spark.sql.files.maxPartitionBytes`` bounds the per-task batch of blobs,
and mapInPandas streams one Arrow batch of payloads at a time so executor
memory holds O(batch), not O(partition).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 64

IMAGE_META_DDL = "struct<width:int, height:int, channels:int, ok:boolean>"


def _seed_of(payload: bytes | None) -> int:
    if not payload:
        return 0
    return int.from_bytes(hashlib.md5(payload).digest()[:4], "big")


def decode_image_meta(payload: bytes | None, fake: bool = False) -> dict:
    """STUB: a real implementation would call PIL/libvips here. The fake
    path emits deterministic plausible dimensions so downstream stages
    (resize planning, batching) are testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips (not in this container); "
            "pass fake=True for the deterministic test stand-in"
        )
    if not payload:
        return {"width": 0, "height": 0, "channels": 0, "ok": False}
    s = _seed_of(payload)
    return {
        "width": 64 + s % 1920,
        "height": 64 + (s >> 8) % 1080,
        "channels": 3,
        "ok": True,
    }


def image_meta_udf(fake: bool = True):
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


def synth_assets(spark, documents: DataFrame, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake asset table from a documents(doc_id, spans) table:
    one asset per media span, payload = repeated md5 bytes of the ref."""

    media = documents.select(
        "doc_id", F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("sp")
    ).select(
        "doc_id", F.col("sp.media_ref").alias("media_ref"),
        F.col("sp.offset").alias("offset"),
    )

    # repeated md5 hex (32 ascii chars) truncated to payload_bytes, as binary
    payload = F.substring(
        F.repeat(F.md5("media_ref"), payload_bytes // 32 + 1), 1, payload_bytes
    ).cast("binary")
    return media.select(
        F.concat("doc_id", F.lit("#"), F.col("offset").cast("string")).alias("asset_id"),
        "doc_id", "media_ref",
        F.lit("image/jpeg").alias("mime"),
        payload.alias("payload"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )
