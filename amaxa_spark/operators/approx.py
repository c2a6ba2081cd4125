"""Approximate aggregates — the one aggregate family the reference
lacks entirely (SURVEY §2.4: "no approximate aggregates").

Everything here is sketch-based and *mergeable*: partial sketches are
built map-side per partition and combined associatively, so the shuffle
carries O(sketch) bytes per group instead of O(distinct values). That
is the property that makes these the right tool at 100 TB, where an
exact COUNT DISTINCT must shuffle every distinct value.

Oracle strategy: approximate values cannot hash-match another engine,
but their *error bounds* are deterministic contracts. The gate queries
return (exact, bound-check boolean) pairs: Spark computes approx and
exact side by side; the DuckDB oracle computes exact and literal TRUE.
If the sketch ever leaves its documented envelope the boolean flips and
the driver's value-hash comparison fails.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, col: str, group_by: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ distinct count (``approx_count_distinct``):
    relative standard deviation ``rsd``, fixed sketch size
    (~1.04/rsd)^2 registers regardless of cardinality. Per group the
    shuffle payload is the sketch, not the value set."""
    aggs = [F.approx_count_distinct(col, rsd).alias("approx_distinct")]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def distinct_with_bound_check(
    df: DataFrame, col: str, rsd: float = 0.05, sigmas: float = 4.0
) -> DataFrame:
    """(exact, approx, within_bound) in ONE job over two aggregates.
    within_bound uses a ``sigmas``·rsd envelope — HLL++ error is
    approximately normal, so 4σ fails with ~6e-5 probability; with
    Spark's fixed hash seed the result is deterministic per dataset,
    which is what lets the gate pin it."""
    agg = df.agg(
        F.countDistinct(col).alias("exact_distinct"),
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
    )
    tol = F.lit(sigmas * rsd)
    return agg.select(
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= tol * F.col("exact_distinct")
        ).alias("within_bound"),
    )


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> list[float]:
    """Greenwald-Khanna approximate quantiles (driver-side list).
    Rank error ≤ 1/accuracy of n; sketches merge across partitions."""
    return df.approxQuantile(col, probs, 1.0 / accuracy)


def quantile_rank_check(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """One row per requested quantile: (prob, rank_ok). The approx
    quantile's true rank must land within ±1/accuracy (+ discreteness
    slack: ties all land at the same rank, so the check rounds up to
    the tied-value ceiling) of the target rank — an exact, engine-
    checkable property even though the quantile value is approximate."""
    spark = df.sparkSession
    eps = 1.0 / accuracy
    vals = approx_quantiles(df, col, probs, accuracy)
    # one pass: every rank bracket as a conditional count in a single agg
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, v in enumerate(vals):
        aggs.append(
            F.sum(F.when(F.col(col) < v, 1).otherwise(0)).alias(f"lo{i}")
        )
        aggs.append(
            F.sum(F.when(F.col(col) <= v, 1).otherwise(0)).alias(f"hi{i}")
        )
    row = df.agg(*aggs).collect()[0]
    n = row["n"]
    checks = []
    for i, p in enumerate(probs):
        # rank range covered by the approx value: (# rows < v, # rows <= v]
        target = p * n
        ok = (row[f"lo{i}"] - eps * n) <= target <= (row[f"hi{i}"] + eps * n)
        checks.append((float(p), bool(ok)))
    return spark.createDataFrame(checks, "prob double, rank_ok boolean")


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    keys: list,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-min-sketch point estimates for chosen keys. The sketch is
    a fixed (ceil(2/eps) × ceil(-log(1-confidence)/log(2))) counter
    grid; merges are element-wise sums (order-independent, exact), so
    estimates are deterministic for a fixed seed. Guarantee:
    exact ≤ estimate ≤ exact + eps·n with prob ≥ confidence."""
    spark = df.sparkSession
    agg = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    n = agg["n"]
    # spark-sketch is a public module (org.apache.spark.util.sketch);
    # point queries against the merged sketch run driver-side over the
    # small key list — the distributed work is the one mergeable agg.
    jsk = spark.sparkContext._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(agg["cms"])
    )
    ests = {k: int(jsk.estimateCount(int(k))) for k in keys}
    exact = {
        r["k"]: r["c"]
        for r in df.groupBy(F.col(col).alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("k").isin(keys))
        .collect()
    }
    out = [(int(k), int(exact.get(k, 0)), ests[k]) for k in keys]
    res = spark.createDataFrame(out, "key long, exact_count long, est long")
    return res.select(
        "key",
        "exact_count",
        (
            (F.col("est") >= F.col("exact_count"))
            & (F.col("est") <= F.col("exact_count") + F.lit(eps) * F.lit(n))
        ).alias("within_bound"),
    )
