"""Approximate-aggregate operators: sketches must honor their
documented error envelopes, and the bound-check queries must be
deterministic (the property the oracle gate pins)."""

from pyspark.sql import functions as F

from amaxa_spark.operators.approx import (
    approx_quantiles,
    distinct_with_bound_check,
    heavy_hitters_cms,
    quantile_rank_check,
)


def test_hll_distinct_within_bound(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    row = distinct_with_bound_check(ev, "user_id", rsd=0.05).collect()[0]
    assert row["within_bound"] is True
    exact = ev.select("user_id").distinct().count()
    assert row["exact_distinct"] == exact


def test_hll_deterministic_across_partitionings(spark, sf_dir):
    # sketch merge is commutative: repartitioning must not change the
    # estimate (this is what makes the gate's value-hash stable)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.agg(F.approx_count_distinct("user_id", 0.05)).collect()[0][0]
    b = (
        ev.repartition(17, "event_id")
        .agg(F.approx_count_distinct("user_id", 0.05))
        .collect()[0][0]
    )
    assert a == b


def test_quantile_rank_envelope(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = quantile_rank_check(
        orders, "o_totalprice", [0.1, 0.5, 0.9], accuracy=1000
    ).collect()
    assert all(r["rank_ok"] for r in res)


def test_quantiles_bracket_exact_median(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    [med] = approx_quantiles(orders, "o_totalprice", [0.5], accuracy=10000)
    n = orders.count()
    below = orders.where(F.col("o_totalprice") < med).count()
    # with accuracy 10000 the rank error on bench-scale data is tiny
    assert abs(below - 0.5 * n) <= max(2, n * 0.001)


def test_cms_overestimates_only(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = heavy_hitters_cms(orders, "o_custkey", keys=[0, 1, 2, 3, 4]).collect()
    for r in res:
        assert r["within_bound"] is True
    # CMS never underestimates — re-derive est >= exact from the check
    # (within_bound already asserts both sides of the envelope)


def test_cms_deterministic_seed(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    a = heavy_hitters_cms(orders, "o_custkey", keys=[7], seed=42).collect()
    b = (
        heavy_hitters_cms(
            orders.repartition(13), "o_custkey", keys=[7], seed=42
        ).collect()
    )
    assert a == b
