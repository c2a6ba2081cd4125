"""Streaming upsert sink onto the versioned bucket layout — the
Delta-streaming-sink twin built on the engine's own commit protocol.

``foreachBatch`` is the right integration point (exactly how Delta's
own MERGE-from-stream is written): each micro-batch's rows reduce to
at most one update per primary key and then run through the SAME
:func:`catalog.merge_into_versioned` the batch path uses, so every
micro-batch lands as one atomic chain commit — readers only ever see
whole micro-batches, crashes leave invisible orphans, and the chain's
seq history doubles as the stream's progress ledger (one commit per
non-empty batch).

Delivery semantics: at-least-once. A replayed micro-batch re-applies
the same per-key LAST values, and MERGE is idempotent for identical
updates — re-commits produce a new generation with identical rows, so
duplicates cannot corrupt data (the superseded generation ages out via
vacuum). Exactly-once would pin ``batchId`` into the commit manifest
and skip already-committed ids; noted in ROADMAP.

Scale shape: each micro-batch shuffles only its own rows (one per-key
window over the batch, never over history), and the merge rewrites
only the buckets the batch touches — steady-state cost tracks update
traffic, not table size. Contention with concurrent writers follows
the CAS rules; a conflicting merge raises ``ConcurrentMergeError``
into the stream (fail-and-restart replays the batch: at-least-once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from amaxa_spark.sources.catalog import merge_into_versioned


def latest_per_key(
    batch: DataFrame, pk: str, order_col: str, tiebreak_col: str | None = None
) -> DataFrame:
    """Reduce a micro-batch to its LAST update per key (deterministic
    (order_col, tiebreak) order) — MERGE requires at most one update
    row per pk, and within one batch the last write wins, exactly like
    replaying the batch row-by-row would."""
    order = [F.col(order_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(pk).orderBy(*order)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_batch(
    spark,
    path: str,
    batch: DataFrame,
    pk: str,
    set_cols: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> dict | None:
    """Apply one micro-batch as one atomic MERGE commit; returns the
    new manifest, or None for an empty batch. This is the body to hand
    to ``foreachBatch``."""
    upd = latest_per_key(batch, pk, order_col, tiebreak_col).select(
        pk, *set_cols
    )
    if not upd.take(1):
        return None
    return merge_into_versioned(spark, path, upd, pk=pk, set_cols=set_cols)


def merge_stream_writer(
    stream: DataFrame,
    path: str,
    pk: str,
    set_cols: list[str],
    order_col: str,
    tiebreak_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming DataFrame to the versioned table: returns the
    ``DataStreamWriter`` (caller starts/stops it). Each micro-batch
    commits atomically through the chain."""

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        upsert_batch(
            batch.sparkSession, path, batch, pk, set_cols,
            order_col, tiebreak_col,
        )

    w = stream.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    return w
