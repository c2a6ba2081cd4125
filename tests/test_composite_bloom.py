"""Composite (multi-column) Bloom keys: `bloom_cols` entries that are
LISTS index the tuple of values, catching the case single-column
blooms cannot — each per-column point filter passes everywhere, but
the COMBINATION exists in few (or no) buckets. Same exactness
contract as every tier: pruned ≡ full + residual, conservatism on
every inconclusive case."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    manifest_to_sql,
    merge_into_versioned,
    read_versioned_table,
    write_versioned_table,
    _bloom_sidecar_name,
    _bucket_manifest,
    _skipping_keep,
)


def _frame(spark, n=20000):
    # the combination (a, b) is structurally sparse: b is a function
    # of the id, so most (a, b) pairs never co-occur
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("string").alias("a"),
        ((F.col("id") * 2) % 50).cast("int").alias("b"),
    )


def test_composite_prunes_where_single_columns_cannot(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(
        df.repartition(8), root, "k", n_buckets=16,
        bloom_cols=[["a", "b"], "a"],
    )
    m = _bucket_manifest(root)
    # both values exist individually in every bucket...
    assert len(_skipping_keep(spark, root, m, None, None, [("a", "4")])) == 16
    # ...but the absent combination prunes everything
    absent = [("a", "4"), ("b", 9)]
    assert _skipping_keep(spark, root, m, None, None, absent) == set()
    assert read_versioned_table(spark, root, eq=absent).count() == 0
    # a present combination stays exact
    present = [("a", "4"), ("b", 8)]
    got = read_versioned_table(spark, root, eq=present).count()
    assert got == df.where("a = '4' AND b = 8").count() > 0


def test_composite_sidecar_name_is_collision_free(spark):
    assert _bloom_sidecar_name("a") == "_bloom-a.json"
    assert _bloom_sidecar_name(["a", "b"]) == "_bloom-a,b.json"
    # a literal comma inside a column name percent-encodes, so the
    # single column "a,b" never collides with the composite (a, b)
    assert _bloom_sidecar_name("a,b") == "_bloom-a%2Cb.json"
    assert _bloom_sidecar_name(["a,b"]) == "_bloom-a%2Cb.json"


def test_composite_conservative_on_partial_or_unsound_eq(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=5000)
    write_versioned_table(
        df.repartition(4), root, "k", n_buckets=4, bloom_cols=[["a", "b"]]
    )
    m = _bucket_manifest(root)
    # only one component: composite cannot speak; nothing pruned
    assert len(_skipping_keep(spark, root, m, None, None, [("a", "4")])) == 4
    # cross-family literal on one component: composite skipped, exact
    got = read_versioned_table(spark, root, eq=[("a", 4), ("b", 8)]).count()
    assert got == df.where("a = 4 AND b = 8").count()
    # NULL component: composite skipped (blooms index non-null tuples)
    assert (
        read_versioned_table(spark, root, eq=[("a", None), ("b", 8)]).count()
        == df.where("a IS NULL AND b = 8").count()
    )


def test_composite_maintained_by_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=5000)
    write_versioned_table(
        df.repartition(4), root, "k", n_buckets=4, bloom_cols=[["a", "b"]]
    )
    # plant a previously-absent combination via MERGE
    merge_into_versioned(
        spark, root,
        spark.createDataFrame([(7, "4", 9)], "k long, a string, b int"),
        "k", ["a", "b"],
    )
    got = read_versioned_table(spark, root, eq=[("a", "4"), ("b", 9)])
    assert [r.k for r in got.collect()] == [7]


def test_composite_flows_to_external_emission(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=5000)
    write_versioned_table(
        df.repartition(4), root, "k", n_buckets=8, bloom_cols=[["a", "b"]]
    )
    absent = [("a", "4"), ("b", 9)]
    sql = manifest_to_sql(root, eq=absent, spark=spark)
    assert duckdb.sql(sql).fetchall() == []
    present = [("a", "4"), ("b", 8)]
    sql2 = manifest_to_sql(root, eq=present, spark=spark)
    assert len(duckdb.sql(sql2).fetchall()) == df.where(
        "a = '4' AND b = 8"
    ).count()
