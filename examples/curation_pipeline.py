"""End-to-end training-data curation pipeline — operator COMPOSITION.

Chains the engine's pieces the way a real corpus build does, running
the expensive stages ONCE and reusing their outputs (see SCALE_NOTES
"Amortizing the clustering pipeline across its consumers"):

  profile → quality gate → near-dup clustering → representative
  selection → leakage-proof group split → per-split token budget

Run:  python examples/curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.operators import dedup as D
from amaxa_spark.operators import text as TXT
from amaxa_spark.operators.quality import Rule, check_constraints, profile
from amaxa_spark.operators.sampling import group_split, split_leakage


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("curation_pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. profile, then gate on what the profile justifies
    print("== profile ==")
    profile(docs).show(truncate=False)
    verdicts = check_constraints(
        docs,
        [
            Rule("pk_unique", "doc_id", "uniqueness", lo=1.0),
            Rule("text_complete", "text", "completeness", lo=1.0),
            Rule("lang_iso2", "lang", "match_rate", pattern="^[a-z]{2}$", lo=0.99),
        ],
    )
    bad = [r["rule"] for r in verdicts.collect() if not r["passed"]]
    if bad:
        raise SystemExit(f"quality gate failed: {bad}")
    print("quality gate: all rules pass")

    # 2. cluster near-dups ONCE; checkpoint and reuse downstream
    pairs = D.ngram_jaccard_pairs(docs, "text", "doc_id", n=4, threshold=0.3)
    clusters = D.cluster_duplicates(pairs).localCheckpoint(eager=True)
    print(f"near-dup members: {clusters.count()}")

    # 3. keep the longest member of each cluster
    reps = D.select_representatives(
        clusters, docs.select(F.col("doc_id").alias("id"), "n_chars"),
        id_col="id", cluster_col="cluster_id", score_col="n_chars",
    )
    drop = reps.where(F.col("is_rep") == 0).select("id")
    kept = docs.join(drop, docs["doc_id"] == drop["id"], "left_anti")
    print(f"kept after dedup: {kept.count()} of {docs.count()}")

    # 4. leakage-proof split: hash the CLUSTER, singletons their own
    # id. Split the FULL corpus (before dropping losers) so the
    # leakage audit is meaningful — auditing only the kept docs is
    # vacuous, every cluster has one survivor
    keyed = (
        docs.select("doc_id")
        .join(clusters, docs["doc_id"] == clusters["id"], "left_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("grp"),
        )
    )
    all_splits = group_split(keyed, "grp").select(
        F.col("doc_id").alias("id"), "split"
    )
    leaks = split_leakage(clusters, all_splits).count()
    print(f"splits assigned; leaking clusters: {leaks} (must be 0)")
    assert leaks == 0
    splits = all_splits.join(
        kept.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )

    # 5. per-split token accounting for the training budget
    toks = TXT.token_stats(kept, "text", "doc_id").select(
        F.col("doc_id").alias("id"), "ws_tokens"
    )
    (
        splits.join(toks, "id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("tokens"),
        )
        .orderBy("split")
        .show()
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
