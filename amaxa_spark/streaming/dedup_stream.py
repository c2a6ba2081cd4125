"""Incremental (streaming) deduplication.

New documents are checked against everything seen so far: the stream
is keyed by content fingerprint (md5 of normalized text — the same
key as batch ``exact_dedup``), and ``applyInPandasWithState`` keeps
the first-seen document id per fingerprint. Each arriving document is
emitted with ``is_dup`` and the representative it duplicates.

Scale notes: state is one row per *distinct* document (fingerprint →
first id), partitioned by fingerprint across the state store — the
same key distribution as the batch hash-aggregate. The near-dup
variant (:mod:`amaxa_spark.streaming.minhash_stream`) swaps the
fingerprint for MinHash band keys and keeps bounded per-band
signature lists; the exact variant here is the deterministic core.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fingerprint", StringType()),
        StructField("is_dup", BooleanType()),
        StructField("dup_of", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("first_id", LongType())])


def _check(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (fingerprint,) = key
    first_id = state.get[0] if state.exists else None
    out_ids, out_dup, out_of = [], [], []
    for pdf in pdfs:
        for doc_id in sorted(int(x) for x in pdf["doc_id"]):
            if first_id is None:
                first_id = doc_id
                out_ids.append(doc_id)
                out_dup.append(False)
                out_of.append(None)
            else:
                out_ids.append(doc_id)
                out_dup.append(doc_id != first_id)
                out_of.append(first_id if doc_id != first_id else None)
    state.update((first_id,))
    yield pd.DataFrame(
        {
            "doc_id": out_ids,
            "fingerprint": fingerprint,
            "is_dup": out_dup,
            "dup_of": pd.array(out_of, dtype="Int64"),
        }
    )


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs: streaming DataFrame with (doc_id, text). Returns the
    per-document dup verdict stream."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = docs.select(F.col("doc_id"), F.md5(norm).alias("fingerprint"))
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _check,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
