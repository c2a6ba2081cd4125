"""Incremental (streaming) NEAR-dup detection: MinHash-LSH with
banded bucket state.

The batch pipeline (``operators/dedup.py:minhash_lsh_pairs``) shuffles
all documents into band buckets once; here the same band keys become
the *state keys* of ``applyInPandasWithState``, so every arriving
document is checked against all previously-seen signatures in its
buckets — across micro-batches — without re-scanning history.

Differences from batch, by design:
- the signature is computed per-row with array expressions (no
  explode/groupBy — a streaming query in update mode cannot shuffle
  into an aggregate before the stateful op);
- the verify step is the signature estimate (matching minhash
  components / num_hashes ≈ Jaccard), not exact n-gram Jaccard — the
  text is not carried into state. Emitted pairs are candidates with
  estimated similarity; an offline exact verify can consume them.

Scale contract: state per bucket is a bounded list of
(doc_id, signature) capped at ``max_reps`` — past the cap the bucket
is saturated and new members are compared against the retained reps
only (the cap bounds both state size and per-event compare cost; LSH
bucket collision rates keep typical buckets tiny). State is
partitioned by band key across the state store, the same distribution
as the batch bucket join.

Signature family matches batch exactly: ``h_i = min(md5(i || '|' ||
shingle))`` over distinct word 3-grams of the normalized text, so a
document's streaming signature equals its batch signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("is_dup", BooleanType()),
        StructField("dup_of", LongType()),
        StructField("est_sim", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", ArrayType(StringType())),
    ]
)


def _sig_columns(text_col: str, n: int, num_hashes: int):
    """Per-row minhash signature, identical to the batch hash family
    (dedup.minhash_signatures) but via array exprs instead of
    explode+agg."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.split(norm, " ")
    grams = F.expr(
        f"CASE WHEN size(__w) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(__w) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__w, i, {n})))) "
        f"ELSE array() END"
    )
    mh = [
        F.array_min(
            F.expr(f"transform(__sh, s -> md5(concat('{i}|', s)))")
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return words.alias("__w"), grams.alias("__sh"), mh


def _check_bucket(threshold: float, num_hashes: int, max_reps: int):
    def check(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, sigs = list(state.get[0]), list(state.get[1])
        else:
            ids, sigs = [], []
        parsed = [s.split("|") for s in sigs]
        out = {"doc_id": [], "band": [], "is_dup": [], "dup_of": [], "est_sim": []}
        band = int(key[0].split("#", 1)[0])
        for pdf in pdfs:
            rows = sorted(
                zip((int(x) for x in pdf["doc_id"]), pdf["sig"]),
                key=lambda t: t[0],
            )
            for doc_id, sig in rows:
                parts = sig.split("|")
                best_id, best_sim = None, -1.0
                for rid, rparts in zip(ids, parsed):
                    if rid == doc_id:
                        continue
                    sim = sum(a == b for a, b in zip(parts, rparts)) / num_hashes
                    if sim > best_sim or (sim == best_sim and rid < best_id):
                        best_id, best_sim = rid, sim
                dup = best_sim >= threshold
                out["doc_id"].append(doc_id)
                out["band"].append(band)
                out["is_dup"].append(dup)
                out["dup_of"].append(best_id if dup else None)
                out["est_sim"].append(best_sim if best_sim >= 0 else None)
                if len(ids) < max_reps and doc_id not in ids:
                    ids.append(doc_id)
                    sigs.append(sig)
                    parsed.append(parts)
        state.update((ids, sigs))
        yield pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "band": out["band"],
                "is_dup": out["is_dup"],
                "dup_of": pd.array(out["dup_of"], dtype="Int64"),
                "est_sim": pd.array(out["est_sim"], dtype="Float64"),
            }
        )

    return check


def streaming_minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    max_reps: int = 64,
) -> DataFrame:
    """docs: streaming DataFrame with (doc_id, text). Returns a
    per-(document, band) candidate stream; a document is a near-dup if
    ANY band marks it (aggregate downstream with min(dup_of)).

    Docs too short to shingle (< n words) are dropped, mirroring the
    batch signature aggregation."""
    rows_per_band = num_hashes // bands
    w, sh, mh = _sig_columns(text_col, n, num_hashes)
    sig = docs.select(F.col("doc_id"), w).select("doc_id", "__w", sh)
    sig = sig.where(F.size("__sh") > 0).select("doc_id", "__sh", *mh)
    sig_str = F.concat_ws("|", *[F.col(f"mh_{i}") for i in range(num_hashes)])
    band_keys = F.array(
        *[
            F.concat_ws(
                "#",
                F.lit(str(b)),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ),
            )
            for b in range(bands)
        ]
    )
    keyed = sig.select(
        "doc_id", sig_str.alias("sig"), F.explode(band_keys).alias("bucket")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _check_bucket(threshold, num_hashes, max_reps),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
