"""Time-series rollups — the hypertable-style bucket aggregation with
gap filling.

``time_bucket_rollup`` is the batch form of a continuous aggregate:
tumbling-bucket aggregation per series key, with empty buckets
materialized (zero-filled) so downstream consumers see a dense,
regular series. Gap filling is the part plain ``groupBy`` can't do —
missing buckets produce no rows at all — and is built here from each
series' [min, max] bucket span via ``sequence`` + ``explode``.

Scale shape: the rollup is one hash aggregation (map-side combined);
the spine is one tiny per-key aggregate (min/max) exploded to bucket
rows — its volume is (#keys × span/width), i.e. the OUTPUT size, not
the input size — then a left join fills observed buckets in. No
window functions, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket_rollup(
    df: DataFrame,
    ts: str,
    key: str,
    value: str,
    width_s: int = 3600,
    fill: bool = True,
) -> DataFrame:
    """Per-(key, bucket) count and sum with optional gap fill.

    Buckets are epoch-second multiples of ``width_s``. With
    ``fill=True`` every key gets one row for EVERY bucket between its
    first and last observation, zero-filled where no events landed.
    Returns (key, bucket_start, n, total) — ``total`` rounded to 4.
    """
    bucket = (F.unix_timestamp(F.col(ts)) / width_s).cast("long") * width_s
    rolled = (
        df.select(F.col(key), bucket.alias("bucket_start"), F.col(value))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value), 4).alias("total"),
        )
    )
    if not fill:
        return rolled
    spine = (
        rolled.groupBy(key)
        .agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(width_s))
            ).alias("bucket_start"),
        )
    )
    return (
        spine.join(rolled, [key, "bucket_start"], "left")
        .select(
            key,
            "bucket_start",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )
