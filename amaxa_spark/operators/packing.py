"""Sequence packing: assign documents to fixed-token-budget packs.

The training-data step after tokenization: greedily fill context
windows with documents. Greedy next-fit packing is inherently
sequential, so the operator shards the corpus (deterministically, by
id ranges), packs each shard in order with an Arrow-batched
``applyInPandas`` grouped map, and namespaces pack ids by shard —
embarrassingly parallel across shards, exact next-fit within each.

At 100 TB: shards are the parallelism unit (pick shard_size so a
shard's (id, n_tokens) pairs fit a worker — the payload text never
moves, only token counts); packing quality loss vs global next-fit is
bounded by one partial pack per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    shard_size: int = 100_000,
) -> DataFrame:
    """Returns (id, n_tokens, pack_id) where pack_id is a string
    "<shard>:<local pack>". Documents larger than the budget get a
    pack of their own (next-fit semantics)."""

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        shard = int(pdf["__shard"].iloc[0])
        packs, cur, used = [], 0, 0
        for t in pdf[token_col]:
            t = int(t)
            if used > 0 and used + t > budget:
                cur += 1
                used = 0
            used += t
            packs.append(f"{shard}:{cur}")
        out = pdf[[id_col, token_col]].copy()
        out["pack_id"] = packs
        return out

    sharded = df.select(id_col, token_col).withColumn(
        "__shard", (F.col(id_col) / shard_size).cast("long")
    )
    schema = f"{id_col} long, {token_col} int, pack_id string"
    return sharded.groupBy("__shard").applyInPandas(pack_shard, schema=schema)


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Context-window chunking: split each document's whitespace
    tokens into fixed-size windows with overlap — the standard
    pre-embedding / pre-training step for documents longer than the
    model context. Returns (id, chunk_id, chunk_text, n_chunk_tokens);
    chunk starts advance by ``max_tokens - overlap`` and every token
    lands in at least one chunk (a shorter-than-window doc is one
    chunk; empty text yields none).

    Scale shape: a pure per-row projection — ``sequence`` generates
    the window starts, ``slice`` cuts each window, ``posexplode``
    emits chunk rows. No shuffle, no Python, and the blow-up factor is
    bounded by max_tokens/(max_tokens - overlap).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    base = df.select(F.col(id_col), words.alias("__w")).where(
        (F.size("__w") > 0) & (F.concat_ws("", "__w") != "")
    )
    # starts: 1, 1+stride, ... covering the final token; a doc shorter
    # than one window gets the single start 1
    n = F.size("__w")
    last_start = F.greatest(
        F.lit(1),
        (F.ceil((n - F.lit(max_tokens)) / F.lit(stride))).cast("int")
        * F.lit(stride)
        + F.lit(1),
    )
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    chunks = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(starts, lambda s: F.slice(F.col("__w"), s, max_tokens))
        ).alias("chunk_id", "__c"),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", "__c").alias("chunk_text"),
        F.size("__c").alias("n_chunk_tokens"),
    )
