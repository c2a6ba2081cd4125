"""Round-11 regression tests for the ADVICE findings:

1. ``merge_into_versioned`` / ``merge_into_versioned_db`` with
   ``not_matched='ignore'`` over a DV-emptied bucket must NOT commit a
   dangling bucket pointer (gen dir with no partition for the bucket)
   — it previously made the table unreadable (PATH_NOT_FOUND).
2. External-engine DV SQL must keep NULL-pk rows like the native
   reader's left_anti join (NOT EXISTS, not NOT IN).
3. CLI ``sql --as-of`` must try ISO-8601 before epoch-float so a
   digit-only date like '29990101' is a date, not ~epoch-second 1970.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from amaxa_spark.__main__ import main
from amaxa_spark.sources.catalog import (
    delete_from_versioned,
    delete_from_versioned_db,
    manifest_to_sql,
    merge_into_versioned,
    merge_into_versioned_db,
    read_versioned_db,
    read_versioned_table,
    write_versioned_db,
    write_versioned_table,
    _bucket_manifest,
)


def _frame(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )


def _keys(spark, *ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


def test_ignore_merge_over_dv_emptied_bucket_keeps_table_readable(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark, 5), root, "k", n_buckets=1)
    # DV-delete every row: bucket 0 is now logically empty but still
    # has a manifest entry (physical files remain on disk)
    delete_from_versioned(
        spark, root, _keys(spark, 0, 1, 2, 3, 4), "k", mode="dv"
    )
    assert read_versioned_table(spark, root).count() == 0
    # an ignore-mode merge keyed to that bucket matches nothing and
    # writes NO partition dir — the manifest must drop the bucket, not
    # point it at the (empty) new generation
    upd = spark.createDataFrame([(99, -1.0)], "k long, v double")
    m = merge_into_versioned(
        spark, root, upd, "k", ["v"], not_matched="ignore"
    )
    assert "0" not in m["buckets"]  # None-dropped, not dangling
    r = read_versioned_table(spark, root)  # was: PATH_NOT_FOUND
    assert r.count() == 0
    # table stays fully writable afterwards
    merge_into_versioned(spark, root, upd, "k", ["v"], not_matched="insert")
    assert read_versioned_table(spark, root).count() == 1


def test_ignore_merge_over_dv_emptied_bucket_db_layout(spark, tmp_path):
    db = str(tmp_path / "db")
    write_versioned_db(
        spark, db, {"t": _frame(spark, 5)}, {"t": "k"}, n_buckets={"t": 1}
    )
    delete_from_versioned_db(
        spark, db, {"t": _keys(spark, 0, 1, 2, 3, 4)}, mode="dv"
    )
    upd = spark.createDataFrame([(99, -1.0)], "k long, v double")
    merge_into_versioned_db(
        spark, db, {"t": upd}, {"t": ["v"]}, not_matched="ignore"
    )
    r = read_versioned_db(spark, db, "t")  # was: PATH_NOT_FOUND
    assert r.count() == 0
    merge_into_versioned_db(
        spark, db, {"t": upd}, {"t": ["v"]}, not_matched="insert"
    )
    assert read_versioned_db(spark, db, "t").count() == 1


def test_external_dv_sql_keeps_null_pk_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "null-pk")], "k long, v string"
    )
    write_versioned_table(df, root, "k", n_buckets=2)
    delete_from_versioned(spark, root, _keys(spark, 1), "k", mode="dv")
    native = read_versioned_table(spark, root)
    assert native.count() == 2  # NULL-pk row survives the left_anti
    assert native.where("k IS NULL").count() == 1
    got = duckdb.sql(manifest_to_sql(root)).df()
    # NOT IN would NULL-out the null-pk row; NOT EXISTS keeps it
    assert len(got) == 2
    assert got["k"].isna().sum() == 1
    assert set(got["v"]) == {"b", "null-pk"}


def test_cli_as_of_digit_only_date_is_iso_not_epoch(spark, tmp_path, capsys):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark, 3), root, "k", n_buckets=2)
    # '29990101' as epoch seconds is 1970 (before the table: error);
    # as ISO-8601 it is year 2999 and resolves the head snapshot
    assert main(["sql", root, "--as-of", "29990101"]) == 0
    out = capsys.readouterr().out
    head = _bucket_manifest(root)
    for gen in set(head["buckets"].values()):
        assert gen in out
    # genuine epoch floats still work
    import time

    assert main(["sql", root, "--as-of", str(time.time() + 60)]) == 0
