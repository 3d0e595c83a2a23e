"""Vector-store sink semantics (reference S10/J6 tier).

The reference upserts chunk documents into a document store keyed by
``_id`` — ``VectorStoreEngine.upsert`` embeds a batch then
``insert_many``s ``{_id, text, $vector, **meta}`` rows, so the LAST batch
containing an id defines that id's row
(/root/reference/src/llm_scraper/vectors/engine.py:53-78,
/root/reference/src/llm_scraper/vectors/dbs/astradb.py:100-116).

Spark re-expression: an upsert is ``incoming ∪ (existing ⟕anti incoming)``
— one anti-join, broadcastable when the incoming batch is small (the
reference batches 20 docs at a time, worker.py:33,383), MERGE INTO on an
Iceberg catalog. The embedding call itself is an external RPC in the
reference (OpenAI, vectors/embeddings/openai.py:54-67); here it is a
deterministic seeded stand-in with the real Arrow plumbing, same pattern
as the multimodal decode stubs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

EMBED_DIM = 64


def fake_embed_udf(dim: int = EMBED_DIM):
    """Deterministic embedding stand-in (seeded by text md5): the Arrow
    batch shape, normalization, and schema match what a real encoder
    adapter returns (reference get_embeddings: batch of texts -> batch of
    unit vectors)."""

    @F.pandas_udf("array<float>")
    def _udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            seed = int.from_bytes(
                hashlib.md5(str(t).encode("utf-8")).digest()[:4], "big")
            v = np.random.RandomState(seed).randn(dim).astype(np.float32)
            v /= np.linalg.norm(v) or 1.0
            out.append(v.tolist())
        return pd.Series(out)

    return _udf


def upsert(existing: DataFrame, incoming: DataFrame,
           id_col: str = "vec_id", broadcast_incoming: bool = True) -> DataFrame:
    """Document-store upsert: every id in ``incoming`` replaces its row in
    ``existing``; other rows pass through (insert_many-by-_id semantics,
    astradb.py:100-116). Equivalent to ``MERGE INTO existing USING incoming
    ON id WHEN MATCHED UPDATE * WHEN NOT MATCHED INSERT *``.

    ``broadcast_incoming`` reflects the reference's small write batches;
    pass False for bulk backfills where the incoming side is large.
    """
    keys = incoming.select(id_col)
    if broadcast_incoming:
        keys = F.broadcast(keys)
    kept = existing.join(keys, on=id_col, how="left_anti")
    return kept.unionByName(incoming)


def embed_chunks(chunks: DataFrame, text_col: str = "text",
                 dim: int = EMBED_DIM) -> DataFrame:
    """chunk rows -> rows with a ``$vector``-equivalent ``embedding``
    column (engine.py:66-75 shape)."""
    return chunks.withColumn("embedding", fake_embed_udf(dim)(F.col(text_col)))
