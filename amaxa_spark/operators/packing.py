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
