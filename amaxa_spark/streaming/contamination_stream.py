"""Streaming benchmark-contamination screening: a STREAM-STATIC join.

The ingest-time twin of ``dedup.benchmark_contamination``: documents
arrive as a stream, the benchmark shingle set is a static frame, and
each micro-batch's docs are scored by the fraction of their distinct
shingles that hit the benchmark — so contaminated documents are
flagged AT INGEST, before they ever land in the training corpus,
instead of by a later batch sweep.

This exercises the streaming pattern the stateful twins don't cover:
the STREAM-STATIC join itself is stateless (each micro-batch joins
the static side directly; broadcast when small). The per-doc
roll-up after it, however, is a streaming aggregation, and Spark
keeps its per-doc state indefinitely (it cannot know that one
document's shingles never span micro-batches in a file ingest) —
stated, not hidden: state grows with documents seen. At corpus
scale run the same scoring inside ``foreachBatch`` with the BATCH
operator (``dedup.benchmark_contamination``) per micro-batch
instead — exact same results when docs don't straddle batches, zero
retained state; this module's update-mode form is the
convenient-default for bounded ingests.

Scale notes: the static bench shingle frame is distinct-projected
once per query start; per-batch cost is linear in batch shingle
volume — identical shape to the batch operator, sliced by
micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amaxa_spark.operators.dedup import word_shingles


def contamination_stream(
    docs_stream: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document contamination verdicts in UPDATE output mode:
    (id, total_shingles, hit_shingles, overlap, contaminated), each
    doc's row emitted in the micro-batch it arrives in (and upserted
    if shingles ever straddle batches)."""
    # bench ≪ corpus by the contamination contract — skip the spread
    # exchange on the static side (same gate as the batch twin)
    bench_sh = (
        word_shingles(bench, text_col, id_col, n, spread=False)
        .select("shingle")
        .distinct()
    )
    sh = word_shingles(docs_stream, text_col, id_col, n)
    scored = sh.join(
        bench_sh.withColumn("__hit", F.lit(1)), "shingle", "left_outer"
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hit_shingles"),
    )
    overlap = F.round(F.col("hit_shingles") / F.col("total_shingles"), 6)
    return agg.select(
        id_col,
        "total_shingles",
        "hit_shingles",
        overlap.alias("overlap"),
        (overlap >= threshold).alias("contaminated"),
    )
