"""FILE-tier data skipping (`file_stats=True`): per-file min/max/null
stats in a per-generation sidecar, consumed under the manifest's
bucket tier, made selective by OPTIMIZE's range-split clustering
(`files_per_bucket > 1`). Same invariant as every skipping tier:
pruned read ≡ full read + predicate, on every snapshot, after every
kind of commit — and conservative whole-directory fallback whenever
the sidecar cannot speak for a bucket.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    MERGE_BUCKET_COL,
    delete_from_versioned,
    merge_into_versioned,
    optimize_versioned,
    read_versioned_db,
    read_versioned_table,
    write_versioned_db,
    write_versioned_table,
    _bucket_manifest,
    _FILESTATS_SIDECAR,
    _pruned_bucket_paths,
    _skipping_keep,
)


def _frame(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id") % 7)
        .alias("g"),
    )


def _paths(root, manifest, prune=None, eq=None, spark=None):
    keep = _skipping_keep(spark, root, manifest, prune, None, eq)
    return _pruned_bucket_paths(root, manifest, keep, prune, eq)


def test_sidecar_written_and_bucket_stats_derived(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark).repartition(4), root, "k", n_buckets=4,
        stats_cols=["v"], file_stats=True,
    )
    m = _bucket_manifest(root)
    assert m["file_stats"] is True
    gen = next(iter(m["buckets"].values()))
    with open(os.path.join(root, gen, _FILESTATS_SIDECAR)) as f:
        sc = json.load(f)
    assert set(sc) == set(m["buckets"])
    # bucket stats must equal the file stats' fold
    for b, files in sc.items():
        ent = m["bucket_stats"][b]
        assert ent["rows"] == sum(e["rows"] for e in files.values())
        mns = [e["cols"]["v"]["min"] for e in files.values()]
        assert ent["cols"]["v"]["min"] == min(mns)


def test_file_stats_requires_stats_cols(spark, tmp_path):
    with pytest.raises(ValueError, match="requires stats_cols"):
        write_versioned_table(
            _frame(spark), str(tmp_path / "t"), "k", n_buckets=2,
            file_stats=True,
        )


def test_range_split_optimize_makes_file_tier_selective(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(
        df.repartition(8), root, "k", n_buckets=4,
        stats_cols=["v"], file_stats=True,
    )
    optimize_versioned(spark, root, cluster_by=["v"], files_per_bucket=4)
    m = _bucket_manifest(root)
    prune = [("v", 100.0, 180.0)]  # ~2% of the v range
    paths = _paths(root, m, prune=prune, spark=spark)
    # v spans every pk-hash bucket (bucket tier is blind), but the
    # range-split files are v-disjoint: far fewer files than total
    total_files = sum(
        len(fs)
        for gen in set(m["buckets"].values())
        for fs in json.load(
            open(os.path.join(root, gen, _FILESTATS_SIDECAR))
        ).values()
    )
    assert all(p.endswith(".parquet") for p in paths)
    assert len(paths) < total_files / 2
    got = read_versioned_table(spark, root, prune=prune).count()
    assert got == df.where("v between 100.0 and 180.0").count()


def test_exactness_after_merge_and_delete(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=1000)
    write_versioned_table(
        df.repartition(4), root, "k", n_buckets=4,
        stats_cols=["v", "g"], file_stats=True,
    )
    merge_into_versioned(
        spark, root,
        spark.createDataFrame([(5, 99999.0), (2000, 7.0)], "k long, v double"),
        "k", ["v"], not_matched="insert",
    )
    delete_from_versioned(
        spark, root, spark.createDataFrame([(10,)], "k long"), "k"
    )
    # the merged-in outlier must be findable through the fine tier
    got = read_versioned_table(spark, root, prune=[("v", 99000.0, None)])
    assert [r.k for r in got.collect()] == [5]
    # eq + IS NULL exactness over the mixed generations
    assert (
        read_versioned_table(spark, root, eq=[("g", 3)]).count()
        == df.where("g = 3 and k != 10").count()
    )
    assert (
        read_versioned_table(spark, root, eq=[("g", None)]).count()
        == df.where("g is null and k != 10").count() + 1  # inserted row
    )


def test_missing_sidecar_falls_back_to_whole_directory(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=1000)
    write_versioned_table(
        df.repartition(4), root, "k", n_buckets=4,
        stats_cols=["v"], file_stats=True,
    )
    m = _bucket_manifest(root)
    gen = next(iter(m["buckets"].values()))
    os.remove(os.path.join(root, gen, _FILESTATS_SIDECAR))
    prune = [("v", 100.0, 120.0)]
    paths = _paths(root, m, prune=prune, spark=spark)
    assert paths and all(not p.endswith(".parquet") for p in paths)
    got = read_versioned_table(spark, root, prune=prune).count()
    assert got == df.where("v between 100.0 and 120.0").count()


def test_undescribed_file_reads_whole_bucket(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=500)
    write_versioned_table(
        df.repartition(2), root, "k", n_buckets=2,
        stats_cols=["v"], file_stats=True,
    )
    m = _bucket_manifest(root)
    b, gen = next(iter(sorted(m["buckets"].items())))
    bdir = os.path.join(root, gen, f"{MERGE_BUCKET_COL}={b}")
    stray = [f for f in os.listdir(bdir) if f.endswith(".parquet")][0]
    # simulate a file the sidecar does not describe
    sc_path = os.path.join(root, gen, _FILESTATS_SIDECAR)
    with open(sc_path) as f:
        sc = json.load(f)
    del sc[b][stray]
    with open(sc_path, "w") as f:
        json.dump(sc, f)
    prune = [("v", 0.0, 1.0)]
    paths = _paths(root, m, prune=prune, spark=spark)
    assert bdir in paths  # conservative: whole dir for that bucket
    got = read_versioned_table(spark, root, prune=prune).count()
    assert got == df.where("v between 0.0 and 1.0").count()


def test_files_per_bucket_validation(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark, 100), root, "k", n_buckets=2)
    with pytest.raises(ValueError, match="requires cluster_by or zorder_by"):
        optimize_versioned(spark, root, files_per_bucket=3)
    with pytest.raises(ValueError, match="files_per_bucket must be"):
        optimize_versioned(spark, root, files_per_bucket=0)


def test_reinit_inherits_file_stats_flag(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark, 200), root, "k", n_buckets=2,
        stats_cols=["v"], file_stats=True,
    )
    write_versioned_table(_frame(spark, 300), root, "k", n_buckets=2)
    m = _bucket_manifest(root)
    assert m["file_stats"] is True
    gen = next(iter(m["buckets"].values()))
    assert os.path.exists(os.path.join(root, gen, _FILESTATS_SIDECAR))


def test_external_sql_emission_carries_file_tier(spark, tmp_path):
    import duckdb

    from amaxa_spark.sources.catalog import manifest_to_sql, optimize_versioned

    root = str(tmp_path / "t")
    df = spark.range(8000).select(
        F.col("id").alias("k"),
        (F.abs(F.xxhash64("id")) % 10000).cast("double").alias("v"),
    )
    write_versioned_table(
        df.repartition(8), root, "k", n_buckets=4,
        stats_cols=["v"], file_stats=True,
    )
    optimize_versioned(spark, root, cluster_by=["v"], files_per_bucket=4)
    prune = [("v", 100.0, 300.0)]
    sql = manifest_to_sql(root, prune=prune)
    assert sql.count(".parquet") < manifest_to_sql(root).count(".parquet")
    got = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    exp = sorted(
        tuple(r)
        for r in read_versioned_table(spark, root, prune=prune)
        .select("k", "v")
        .collect()
    )
    assert got == exp
    # the file tier refuting every file still yields a typed-empty scan
    assert duckdb.sql(
        manifest_to_sql(root, prune=[("v", 10**9, 10**9)])
    ).fetchall() == []


def test_db_layout_file_stats(spark, tmp_path):
    db = str(tmp_path / "db")
    df = _frame(spark, 600)
    write_versioned_db(
        spark, db, {"a": df.repartition(3)}, {"a": "k"}, n_buckets=2,
        stats_cols={"a": ["v"]}, file_stats={"a": True},
    )
    from amaxa_spark.sources.catalog import _db_manifest

    t = _db_manifest(db)["tables"]["a"]
    assert t["file_stats"] is True
    gen = next(iter(t["buckets"].values()))
    assert os.path.exists(os.path.join(db, "a", gen, _FILESTATS_SIDECAR))
    prune = [("v", 10.0, 20.0)]
    got = read_versioned_db(spark, db, "a", prune=prune).count()
    assert got == df.where("v between 10.0 and 20.0").count()
    with pytest.raises(ValueError, match="requires stats_cols"):
        write_versioned_db(
            spark, str(tmp_path / "db2"), {"a": df}, {"a": "k"},
            n_buckets=2, file_stats={"a": True},
        )


def test_db_optimize_parity_cluster_and_split(spark, tmp_path):
    from amaxa_spark.sources.catalog import optimize_versioned_db, _db_manifest

    db = str(tmp_path / "db")
    df = _frame(spark, n=2000)
    write_versioned_db(
        spark, db,
        {"a": df.repartition(4), "b": df.repartition(4)},
        {"a": "k", "b": "k"}, n_buckets=2,
        stats_cols={"a": ["v"]}, file_stats={"a": True},
    )
    m, compacted = optimize_versioned_db(
        spark, db,
        cluster_by={"a": ["v"]},
        files_per_bucket={"a": 4},
    )
    # a: every bucket rewritten, range-split; b: untouched (no
    # fragmentation beyond max_files=1? b HAS >1 file per bucket from
    # repartition(4) -> it compacts under the max_files rule)
    assert any(c.startswith("a/") for c in compacted)
    assert m["clustering"]["a"] == {"by": ["v"], "kind": "linear"}
    gen = next(iter(m["tables"]["a"]["buckets"].values()))
    sc = json.load(
        open(os.path.join(db, "a", gen, _FILESTATS_SIDECAR))
    )
    assert all(len(files) >= 3 for files in sc.values())
    # file-tier pruning now selective on the db table
    prune = [("v", 100.0, 140.0)]
    got = read_versioned_db(spark, db, "a", prune=prune).count()
    assert got == df.where("v between 100.0 and 140.0").count()
    with pytest.raises(ValueError, match="files_per_bucket > 1 requires"):
        optimize_versioned_db(spark, db, files_per_bucket=3)
    with pytest.raises(ValueError, match="mutually exclusive"):
        optimize_versioned_db(
            spark, db, cluster_by={"a": ["v"]}, zorder_by={"a": ["v"]}
        )
