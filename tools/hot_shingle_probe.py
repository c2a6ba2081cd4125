"""Hot-shingle probe: measure what the stop-shingle cap
(`ngram_jaccard_pairs(max_doc_freq=...)`) buys when a boilerplate
shingle goes corpus-wide — the O(df²) blow-up the round-6 verdict
flagged in the exact-Jaccard pipeline queries.

Corpus: N docs of unique filler text (no accidental overlap), of
which HOT docs share one planted 6-word banner (→ three 4-gram
shingles, each df = HOT ≥ 10⁴), plus PAIRS planted true near-dup
pairs (≥0.8 Jaccard on their own vocabulary). Measures:

1. the candidate-join row count Σ df·(df−1)/2 with and without the
   cap (computed from the df table — the rows the inverted-index
   self-join would emit, without having to materialize them);
2. end-to-end `ngram_jaccard_pairs` wall time capped vs uncapped;
3. that every planted true pair SURVIVES the cap (their evidence
   shingles are rare; only boilerplate-only overlap is lost).

Usage: python tools/hot_shingle_probe.py [n_docs] [hot_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark.operators import dedup as D
from amaxa_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
HOT = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
PAIRS = 50
CAP = 256
BANNER = "please accept all cookies to continue"


def build_corpus(spark):
    # unique filler: 12 words derived from the doc id — no two docs
    # share a filler 4-gram
    filler = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{k}x"), F.col("id"))
            for k in range(12)
        ],
    )
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < HOT, F.concat(F.lit(BANNER + " "), filler))
        .otherwise(filler)
        .alias("text"),
    )
    # planted near-dups: doc N+2i and N+2i+1 share 11 of 12 words
    a = spark.range(PAIRS).select(
        (F.lit(N) + 2 * F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"p{k}q"), F.col("id")) for k in range(12)]
        ).alias("text"),
    )
    b = spark.range(PAIRS).select(
        (F.lit(N) + 2 * F.col("id") + 1).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"p{k}q"), F.col("id")) for k in range(11)],
            F.concat(F.lit("tailzz"), F.col("id")),
        ).alias("text"),
    )
    return base.unionByName(a).unionByName(b)


def main():
    spark = get_spark("hot_shingle_probe")
    docs = build_corpus(spark).repartition(32).localCheckpoint(eager=True)
    n = docs.count()
    print(f"corpus: {n:,} docs, banner df={HOT:,}, {PAIRS} planted pairs")

    sh = D.word_shingles(docs, "text", "doc_id", 4)
    df_tab = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    cand = df_tab.select(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("all"),
        F.sum(
            F.when(F.col("df") <= CAP, F.col("df") * (F.col("df") - 1) / 2)
            .otherwise(F.lit(0))
        ).alias("capped"),
        F.max("df").alias("max_df"),
    ).collect()[0]
    print(
        f"candidate join rows: uncapped={int(cand['all']):,} "
        f"capped(df<={CAP})={int(cand['capped']):,} "
        f"(max df={cand['max_df']:,}; reduction "
        f"{cand['all'] / max(cand['capped'], 1):,.0f}x)"
    )

    t0 = time.time()
    capped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=4, threshold=0.3, max_doc_freq=CAP
    ).localCheckpoint(eager=True)
    t_capped = time.time() - t0
    print(f"capped pipeline: {capped.count()} pairs in {t_capped:.1f}s")

    survived = capped.where(
        (F.col("id_a") >= N) & (F.col("id_b") == F.col("id_a") + 1)
    ).count()
    print(f"planted true pairs surviving the cap: {survived}/{PAIRS}")

    t0 = time.time()
    uncapped = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=4, threshold=0.3
    ).localCheckpoint(eager=True)
    t_uncapped = time.time() - t0
    print(f"uncapped pipeline: {uncapped.count()} pairs in {t_uncapped:.1f}s")
    extra = uncapped.exceptAll(capped).count()
    print(
        f"pairs the cap loses: {extra} "
        "(boilerplate-only overlap; every one is below threshold on "
        "non-banner evidence)"
    )


if __name__ == "__main__":
    main()
