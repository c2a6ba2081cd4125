"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (enabled session-wide in
:mod:`amaxa_spark.session`) handles most cases at runtime; these
helpers cover the two patterns AQE cannot: broadcast-ineligible
aggregations over a hot key, and joins where one side must be
replicated per salt.

Pattern: salt the skewed (fact) side with ``salt = hash(row) % S``,
replicate the dim side S times, join on (key, salt). Aggregations use
the two-stage form: partial agg on (key, salt), final agg on key —
which is exactly what map-side combine does for algebraic aggregates,
expressed explicitly for composed ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact table against a dim table by salting the
    fact side and replicating the dim side ``salt_buckets`` times.
    Output columns = fact ∪ dim (minus the duplicate key)."""
    salted_fact = fact.withColumn(
        "__salt", (F.xxhash64(*[F.col(c) for c in fact.columns]) % salt_buckets + salt_buckets) % salt_buckets
    )
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_fact.join(replicated_dim, [key, "__salt"], how)
    return out.drop("__salt")


def two_stage_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed keys: partial agg on
    (key, salt), final merge on key. ``aggs`` maps column → one of
    count/sum/min/max (algebraic aggregates that re-merge)."""
    salted = df.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % salt_buckets + salt_buckets) % salt_buckets
    )
    partial_exprs, final_exprs = [], []
    for col, fn in aggs.items():
        p = f"__p_{col}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(f"{fn}_{col}"))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(f"{fn}_{col}"))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
