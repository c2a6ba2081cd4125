"""RESTORE (metadata-only rollback to a retained snapshot) and
SHALLOW CLONE (hard-link table branch with an independent commit
chain) on the versioned layouts."""

import os

import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    clone_versioned,
    delete_from_versioned,
    merge_into_versioned,
    read_versioned_db,
    read_versioned_table,
    restore_versioned,
    restore_versioned_db,
    update_versioned,
    vacuum_versioned,
    write_versioned_db,
    write_versioned_table,
    _bucket_manifest,
    _db_manifest,
)


def _frame(spark, n=80):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )


def _vals(spark, root, **kw):
    return {
        r.k: r.v for r in read_versioned_table(spark, root, **kw).collect()
    }


def test_restore_rolls_back_and_keeps_history(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    t0 = _bucket_manifest(root)["token"]
    update_versioned(spark, root, {"v": F.lit(0.0)}, where="g = 1")
    t1 = _bucket_manifest(root)["token"]
    delete_from_versioned(
        spark, root, spark.createDataFrame([(2,)], "k long"), "k"
    )
    restored = restore_versioned(root, t0)
    got = _vals(spark, root)
    assert got[1] == 1.0 and 2 in got  # pre-update, pre-delete state
    assert restored["seq"] > 2  # an ordinary commit, not history surgery
    # the rolled-over states stay time-travelable
    assert _vals(spark, root, token=t1)[1] == 0.0
    # and new work continues on the restored baseline
    update_versioned(spark, root, {"v": F.lit(9.0)}, where="k = 3")
    assert _vals(spark, root)[3] == 9.0


def test_restore_refuses_vacuumed_snapshots(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    t0 = _bucket_manifest(root)["token"]
    # full rewrite supersedes every t0 generation, then vacuum them
    write_versioned_table(
        _frame(spark).withColumn("v", F.col("v") + 1), root, "k",
        n_buckets=4,
    )
    vacuum_versioned(root, keep_last=1, min_age_s=0.0)
    with pytest.raises(ValueError, match="vacuumed|retained"):
        restore_versioned(root, t0)


def test_restore_db_is_cross_table_consistent(spark, tmp_path):
    db = str(tmp_path / "db")
    df = _frame(spark)
    write_versioned_db(
        spark, db, {"a": df, "b": df}, {"a": "k", "b": "k"}, n_buckets=2
    )
    t0 = _db_manifest(db)["token"]
    from amaxa_spark.sources.catalog import update_versioned_db

    update_versioned_db(
        spark, db,
        {"a": {"set": {"v": "v + 10"}}, "b": {"set": {"v": "v + 20"}}},
    )
    restore_versioned_db(db, t0)
    a = {r.k: r.v for r in read_versioned_db(spark, db, "a").collect()}
    b = {r.k: r.v for r in read_versioned_db(spark, db, "b").collect()}
    assert a[1] == 1.0 and b[1] == 1.0  # both tables rolled together


def test_clone_is_independent_and_zero_copy(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_versioned_table(
        _frame(spark), src, "k", n_buckets=4, stats_cols=["v"],
    )
    clone = clone_versioned(src, dst)
    assert clone["seq"] == 0
    assert _vals(spark, dst) == _vals(spark, src)
    # shared inodes: at least one parquet file has link count 2
    linked = False
    for dirpath, _, files in os.walk(dst):
        for f in files:
            if f.endswith(".parquet"):
                if os.stat(os.path.join(dirpath, f)).st_nlink >= 2:
                    linked = True
    assert linked
    # divergence: writes on one side never show on the other
    update_versioned(spark, dst, {"v": F.lit(-1.0)}, where="k = 1")
    assert _vals(spark, dst)[1] == -1.0
    assert _vals(spark, src)[1] == 1.0
    merge_into_versioned(
        spark, src,
        spark.createDataFrame([(2, 99.0)], "k long, v double"), "k", ["v"],
    )
    assert _vals(spark, src)[2] == 99.0
    assert _vals(spark, dst)[2] == 2.0
    # skipping works on the clone from the first read (stats carried)
    assert read_versioned_table(
        spark, dst, prune=[("v", 1000.0, None)]
    ).count() == 0


def test_clone_survives_source_vacuum(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_versioned_table(_frame(spark), src, "k", n_buckets=2)
    clone_versioned(src, dst)
    # source moves on and vacuums the shared generation away
    write_versioned_table(
        _frame(spark).withColumn("v", F.col("v") * 2), src, "k",
        n_buckets=2,
    )
    vacuum_versioned(src, keep_last=1, min_age_s=0.0)
    # the clone still reads its snapshot (hard links kept the inodes)
    assert _vals(spark, dst)[3] == 3.0


def test_clone_by_token_and_fresh_target_required(spark, tmp_path):
    src = str(tmp_path / "src")
    write_versioned_table(_frame(spark), src, "k", n_buckets=2)
    t0 = _bucket_manifest(src)["token"]
    update_versioned(spark, src, {"v": F.lit(0.0)})
    dst = str(tmp_path / "dst")
    clone_versioned(src, dst, token=t0)
    assert _vals(spark, dst)[5] == 5.0  # pre-update snapshot
    with pytest.raises(FileExistsError):
        clone_versioned(src, dst)


def test_table_cli_verbs(spark, tmp_path, capsys):
    from amaxa_spark.__main__ import main

    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark, 40), root, "k", n_buckets=2, stats_cols=["v"]
    )
    t0 = _bucket_manifest(root)["token"]
    update_versioned(spark, root, {"v": F.lit(0.0)}, where="k < 5")
    assert main(["table", "history", root]) == 0
    out = capsys.readouterr().out
    assert out.count('"seq"') == 2
    assert main(["table", "stats", root]) == 0
    assert '"rows"' in capsys.readouterr().out
    assert main(["table", "restore", root, t0]) == 0
    capsys.readouterr()
    assert _vals(spark, root)[1] == 1.0
    dst = str(tmp_path / "c")
    assert main(["table", "clone", root, dst, "--token", t0]) == 0
    capsys.readouterr()
    assert _vals(spark, dst)[2] == 2.0
    assert main(["table", "vacuum", root, "--keep-last", "3"]) == 0


def test_rebucket_versioned(spark, tmp_path):
    from amaxa_spark.sources.catalog import (
        merge_into_versioned,
        rebucket_versioned,
        read_versioned_table as rvt,
    )

    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark, 200), root, "k", n_buckets=2, stats_cols=["v"],
        constraints={"v_nonneg": "v >= 0"},
    )
    t0 = _bucket_manifest(root)["token"]
    m = rebucket_versioned(spark, root, 16)
    assert m["n_buckets"] == 16 and len(m["buckets"]) > 2
    # rows identical, configuration inherited
    assert _vals(spark, root) == _vals(spark, root, token=t0)
    assert m["stats_cols"] == ["v"]
    assert m["constraints"] == {"v_nonneg": "v >= 0"}
    # old snapshot still reads with the OLD layout
    assert len(_bucket_manifest(root, t0)["buckets"]) <= 2
    # merges keep working against the new layout (and stats prune)
    merge_into_versioned(
        spark, root,
        spark.createDataFrame([(5, 70.0, 9999.0)], "k long, g double, v double").select("k", "v"),
        "k", ["v"],
    )
    got = rvt(spark, root, prune=[("v", 9000.0, None)]).collect()
    assert [r.k for r in got] == [5]
    with pytest.raises(ValueError, match="n_buckets"):
        rebucket_versioned(spark, root, 0)
