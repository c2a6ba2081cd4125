"""One-call corpus curation: the composition pipeline as an operator.

The training-data build most users actually run — heuristic quality
gate → near-dup clustering → canonical representative per cluster →
leakage-proof group-aware split — composed so every expensive stage
runs ONCE and is reused by its consumers (the amortized shape
SCALE_NOTES documents; the per-query bench entries price each stage's
self-contained worst case instead).

Reachable as ``python -m amaxa_spark curate`` and as the library call
:func:`curate_corpus`. Beyond-reference surface (the reference is an
ETL tool, not a corpus curator); the stages themselves are the
oracle-gated operators `gopher_rules`, `ngram_jaccard_pairs`,
`cluster_duplicates`, `select_representatives`, `group_split`,
`split_leakage`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amaxa_spark.operators import dedup as D
from amaxa_spark.operators.sampling import group_split, split_leakage
from amaxa_spark.operators.text import gopher_rules, token_stats


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_n: int = 4,
    jaccard_threshold: float = 0.3,
    jaccard_max_doc_freq: int | None = 256,
    fractions: dict[str, float] | None = None,
    gopher_kwargs: dict | None = None,
    strip_lines: bool = False,
    strip_spans: bool = False,
) -> dict[str, DataFrame]:
    """Run the full curation chain and return every intermediate frame:

    ``stripped`` — (only when ``strip_lines``/``strip_spans``) the
                   boilerplate-stripped corpus the rest of the chain
                   runs on: inter-document duplicated lines
                   (:func:`dedup.strip_duplicated_lines`) and/or
                   cross-document repeated spans
                   (:func:`dedup.strip_repeated_spans`) removed FIRST,
                   so the quality gate and near-dup clustering judge
                   content, not shared chrome
    ``flags``    — per-doc Gopher rule signals + keep verdict
    ``clusters`` — near-dup (id, cluster_id) members (checkpointed:
                   clustering runs once, three consumers reuse it)
    ``kept``     — quality-passing docs minus non-representative
                   cluster members
    ``splits``   — (id, split) for every KEPT doc, derived from the
                   cluster hash so near-dups can never straddle splits
    ``summary``  — per-split doc + whitespace-token counts

    Scale shape: one corpus scan feeds the gate, one shingle pipeline
    feeds clustering, and everything downstream joins duplicate-sized
    or kept-sized frames; the split is a projection over a hash. The
    leakage audit runs over the FULL corpus assignment (auditing only
    kept docs is vacuous — every cluster keeps one survivor).

    ``jaccard_max_doc_freq`` (default 256) is the stop-shingle cap:
    shingles occurring in more than that many documents are excluded
    from PAIRING (doc sizes still count them), which bounds the
    inverted-index self-join at O(cap²) candidate rows per shingle.
    Without it a single corpus-wide boilerplate 4-gram (df ≈ 10⁵ on
    natural web text) alone generates ~10¹⁰ candidate pairs — the
    difference between a pipeline that survives 100× growth and one
    that dies in its first join. A pair supported ONLY by >cap
    shingles is boilerplate overlap, not near-duplication; set None
    to recover exact semantics on small corpora.
    """
    out: dict[str, DataFrame] = {}
    if strip_lines:
        cleaned = D.strip_duplicated_lines(docs, text_col, id_col).select(
            id_col, F.col("text_clean").alias(text_col)
        )
        # the cleaned text joins BACK onto the source frame so every
        # other column (url, lang, metadata…) survives the pre-stage
        docs = docs.drop(text_col).join(cleaned, id_col)
    if strip_spans:
        # preserve_raw: the curated corpus keeps its casing, newlines
        # and spacing (only the duplicated spans disappear) — without
        # it the rebuilt text is the lowercased one-line normalized
        # form and the downstream line-based Gopher signals
        # (bullet_ratio, ellipsis_ratio) are judged on a single line
        cleaned = D.strip_repeated_spans(
            docs, text_col, id_col, preserve_raw=True
        ).select(id_col, F.col("text_clean").alias(text_col))
        docs = docs.drop(text_col).join(cleaned, id_col)
    if strip_lines or strip_spans:
        # several downstream pipelines (gate, two shingle passes,
        # token stats) reread this frame — materialize it once
        docs = docs.localCheckpoint(eager=True)
        out["stripped"] = docs

    flags = gopher_rules(docs, text_col, id_col, **(gopher_kwargs or {}))
    passed = docs.join(
        flags.where(F.col("keep") == 1).select(id_col), id_col, "left_semi"
    )

    pairs = D.ngram_jaccard_pairs(
        passed, text_col, id_col, n=jaccard_n, threshold=jaccard_threshold,
        max_doc_freq=jaccard_max_doc_freq,
    )
    clusters = D.cluster_duplicates(pairs).localCheckpoint(eager=True)

    reps = D.select_representatives(
        clusters,
        passed.select(F.col(id_col).alias("id"), F.length(text_col).alias("__len")),
        id_col="id",
        cluster_col="cluster_id",
        score_col="__len",
    )
    drop = reps.where(F.col("is_rep") == 0).select("id")
    kept = passed.join(drop, passed[id_col] == drop["id"], "left_anti")

    # split the full gated corpus on the cluster hash (singletons hash
    # their own id), then restrict to kept docs. The cluster frame's
    # id column is renamed first so an id_col literally named "id"
    # (the CLI exposes --id-col) cannot become ambiguous in the join.
    keyed = (
        passed.select(id_col)
        .join(
            clusters.select(
                F.col("id").alias("__cid"), F.col("cluster_id")
            ),
            F.col(id_col) == F.col("__cid"),
            "left_outer",
        )
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("__grp"),
        )
    )
    all_splits = group_split(keyed, "__grp", fractions).select(
        F.col(id_col).alias("id"), "split"
    )
    splits = all_splits.join(
        kept.select(F.col(id_col).alias("id")), "id", "left_semi"
    )

    toks = token_stats(kept, text_col, id_col).select(
        F.col(id_col).alias("id"), "ws_tokens"
    )
    summary = (
        splits.join(toks, "id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("ws_tokens").alias("tokens"),
        )
        .orderBy("split")
    )
    out.update(
        {
            "flags": flags,
            "clusters": clusters,
            "kept": kept,
            "all_splits": all_splits,
            "splits": splits,
            "summary": summary,
        }
    )
    return out


def audit_leakage(result: dict[str, DataFrame]) -> int:
    """Number of near-dup clusters straddling splits in a
    :func:`curate_corpus` result — 0 by construction; the audit is the
    proof, not a hope."""
    return split_leakage(result["clusters"], result["all_splits"]).count()
