"""Metadata-only ALTER DROP COLUMN on both versioned layouts: readers
project the column out, pre-drop tokens time-travel with it, rewrites
shed it physically (ADD's incremental-backfill deal, mirrored), and
per-column artifacts (stats, bloom keys, added specs) strip in the
same commit. Name re-use is refused until a full-rewrite re-init."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    alter_versioned_add_columns,
    alter_versioned_add_constraint,
    alter_versioned_db_drop_columns,
    alter_versioned_drop_columns,
    export_snapshot,
    manifest_to_sql,
    merge_into_versioned,
    read_versioned_db,
    read_versioned_table,
    update_versioned,
    write_versioned_db,
    write_versioned_table,
    _bucket_manifest,
    _db_manifest,
)


def _frame(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )


def test_drop_projects_out_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    t0 = _bucket_manifest(root)["token"]
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    assert "v" not in read_versioned_table(spark, root).columns
    assert "v" in read_versioned_table(spark, root, token=t0).columns
    assert read_versioned_table(spark, root).count() == 100


def test_drop_strips_column_artifacts(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark), root, "k", n_buckets=4,
        stats_cols=["g", "v"], bloom_cols=[["g", "v"], "g"],
    )
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    m = _bucket_manifest(root)
    assert m["stats_cols"] == ["g"]
    assert m["bloom_cols"] == ["g"]  # composite key died with v
    assert all(
        "v" not in e["cols"] for e in m["bucket_stats"].values()
    )
    # surviving tiers still prune exactly
    assert read_versioned_table(spark, root, eq=[("g", 99)]).count() == 0


def test_rewrites_shed_dropped_column_physically(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    merge_into_versioned(
        spark, root,
        spark.createDataFrame([(1, 99)], "k long, g long"), "k", ["g"],
    )
    m = _bucket_manifest(root)
    new_gens = {g for g in m["buckets"].values()}
    # at least one rewritten generation must physically lack v
    import pyarrow.parquet as pq

    shed = False
    for gen in new_gens:
        gdir = os.path.join(root, gen)
        for bdir in os.listdir(gdir):
            full = os.path.join(gdir, bdir)
            if not os.path.isdir(full):
                continue
            for f in os.listdir(full):
                if f.endswith(".parquet"):
                    names = pq.read_schema(os.path.join(full, f)).names
                    if "v" not in names:
                        shed = True
    assert shed
    got = {r.k: r.g for r in read_versioned_table(spark, root).collect()}
    assert got[1] == 99 and got[2] == 2


def test_drop_validations(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=2)
    with pytest.raises(ValueError, match="key column"):
        alter_versioned_drop_columns(root, ["k"], spark=spark)
    with pytest.raises(ValueError, match="no column"):
        alter_versioned_drop_columns(root, ["nope"], spark=spark)
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    with pytest.raises(ValueError, match="already dropped"):
        alter_versioned_drop_columns(root, ["v"], spark=spark)
    with pytest.raises(ValueError, match="was dropped"):
        alter_versioned_add_columns(root, {"v": ("double", 0.0)}, spark=spark)
    alter_versioned_add_constraint(spark, root, "g_ok", "g >= 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        alter_versioned_drop_columns(root, ["g"], spark=spark)


def test_drop_flows_to_emission_and_export(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    sql = manifest_to_sql(root)
    assert '"v"' not in sql
    rows = duckdb.sql(sql).fetchall()
    assert len(rows) == 100 and len(rows[0]) == 2
    with pytest.raises(ValueError, match="pass spark="):
        export_snapshot(root, str(tmp_path / "exp0"))
    rec = export_snapshot(root, str(tmp_path / "exp"), spark=spark)
    assert rec["mode"] == "materialized"
    cols = duckdb.sql(
        f"select * from read_parquet('{tmp_path}/exp/*.parquet') limit 0"
    ).columns
    assert sorted(cols) == ["g", "k"]


def test_update_after_drop_and_reinit_frees_name(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    alter_versioned_drop_columns(root, ["v"], spark=spark)
    update_versioned(spark, root, {"g": F.lit(7)}, where="k < 10")
    got = {r.k: r.g for r in read_versioned_table(spark, root).collect()}
    assert got[3] == 7 and got[50] == 0
    # a full-rewrite re-init resets the drop list and frees the name
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    m = _bucket_manifest(root)
    assert "dropped_columns" not in m
    assert "v" in read_versioned_table(spark, root).columns


def test_db_twin_drop(spark, tmp_path):
    db = str(tmp_path / "db")
    df = _frame(spark)
    write_versioned_db(
        spark, db, {"a": df, "b": df}, {"a": "k", "b": "k"}, n_buckets=2
    )
    alter_versioned_db_drop_columns(db, "a", ["v"], spark=spark)
    assert "v" not in read_versioned_db(spark, db, "a").columns
    assert "v" in read_versioned_db(spark, db, "b").columns  # b untouched
    t = _db_manifest(db)["tables"]["a"]
    assert t["dropped_columns"] == ["v"]
    with pytest.raises(ValueError, match="no table"):
        alter_versioned_db_drop_columns(db, "zz", ["v"], spark=spark)
