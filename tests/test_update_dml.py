"""UPDATE — the third DML verb on the versioned layouts — plus the
round-9 eq-skipping upgrades (equality conjuncts consulting range
stats; IS NULL consulting null counts).

The UPDATE invariant mirrors the skipping one: an UPDATE must leave
the table exactly as `SELECT ... CASE WHEN pred THEN expr ELSE col
END` over the pre-update snapshot would, regardless of which buckets
the two-tier targeting decided to rewrite.
"""

import os

import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    MERGE_BUCKET_COL,
    delete_from_versioned,
    read_versioned_db,
    read_versioned_table,
    update_versioned,
    update_versioned_db,
    write_versioned_db,
    write_versioned_table,
    _bucket_manifest,
    _db_manifest,
    _skipping_keep,
)


def _frame(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.0).alias("v"),
        F.concat(F.lit("s"), F.col("id") % 5).alias("s"),
    )


def _as_map(df, *cols):
    return {r["k"]: tuple(r[c] for c in cols) for r in df.collect()}


def test_update_matches_case_when(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(df, root, "k", n_buckets=8, stats_cols=["g", "v"])
    update_versioned(
        spark, root, {"v": "v * 2", "s": F.lit("hit")}, where="g = 3"
    )
    got = _as_map(read_versioned_table(spark, root), "v", "s")
    exp = _as_map(
        df.withColumn(
            "v", F.when(F.col("g") == 3, F.col("v") * 2).otherwise(F.col("v"))
        ).withColumn(
            "s", F.when(F.col("g") == 3, F.lit("hit")).otherwise(F.col("s"))
        ),
        "v",
        "s",
    )
    assert got == exp


def test_update_prune_eq_where_conjunction(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(df, root, "k", n_buckets=8, stats_cols=["g"])
    # predicate = g in [2,4] AND s = 's1' AND k < 200 — all three parts
    update_versioned(
        spark,
        root,
        {"v": F.lit(-1.0)},
        where="k < 200",
        prune=[("g", 2, 4)],
        eq=[("s", "s1")],
    )
    pred = (F.col("g") >= 2) & (F.col("g") <= 4) & (F.col("s") == "s1") & (
        F.col("k") < 200
    )
    got = _as_map(read_versioned_table(spark, root), "v")
    exp = _as_map(
        df.withColumn("v", F.when(pred, F.lit(-1.0)).otherwise(F.col("v"))),
        "v",
    )
    assert got == exp


def test_update_no_match_is_metadata_only(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=8)
    before = _bucket_manifest(root)
    after = update_versioned(spark, root, {"v": F.lit(0.0)}, where="g = 99")
    assert after["token"] == before["token"]  # head unchanged
    marked = update_versioned(
        spark, root, {"v": F.lit(0.0)}, where="g = 99",
        extra_meta={"note": "nothing"},
    )
    assert marked["note"] == "nothing"
    assert marked["buckets"] == before["buckets"]


def test_update_rewrites_only_matching_buckets(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(df, root, "k", n_buckets=16)
    before = dict(_bucket_manifest(root)["buckets"])
    # a single-key predicate touches exactly that key's pk-hash bucket
    update_versioned(spark, root, {"v": F.lit(9.9)}, where="k = 123")
    after = dict(_bucket_manifest(root)["buckets"])
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1
    got = _as_map(read_versioned_table(spark, root), "v")
    assert got[123] == (9.9,)
    assert got[124] == (124.0,)


def test_update_rejects_pk_and_unknown_columns(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    with pytest.raises(ValueError, match="cannot set"):
        update_versioned(spark, root, {"k": F.lit(1)})
    with pytest.raises(ValueError, match="cannot set"):
        update_versioned(spark, root, {MERGE_BUCKET_COL: F.lit(1)})
    with pytest.raises(ValueError, match="do not exist"):
        update_versioned(spark, root, {"nope": F.lit(1)})


def test_update_assignment_cast_keeps_column_type(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    # v is double; an int literal must land as double, not narrow/widen
    update_versioned(spark, root, {"v": F.lit(7)}, where="g = 0")
    df = read_versioned_table(spark, root)
    assert dict(df.dtypes)["v"] == "double"
    assert _as_map(df, "v")[0] == (7.0,)


def test_update_time_travel_shows_pre_update_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark), root, "k", n_buckets=4)
    t0 = _bucket_manifest(root)["token"]
    update_versioned(spark, root, {"v": F.lit(0.0)}, where="g = 1")
    old = _as_map(read_versioned_table(spark, root, token=t0), "v")
    assert old[1] == (1.0,)
    new = _as_map(read_versioned_table(spark, root), "v")
    assert new[1] == (0.0,)


def test_update_full_table_when_no_predicate(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark, n=50), root, "k", n_buckets=4)
    update_versioned(spark, root, {"v": F.lit(5.0)})
    vals = {v for (v,) in _as_map(read_versioned_table(spark, root), "v").values()}
    assert vals == {5.0}


def test_update_stats_maintained_after_rewrite(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(
        _frame(spark), root, "k", n_buckets=8, stats_cols=["v"]
    )
    update_versioned(spark, root, {"v": F.lit(10000.0)}, where="k = 7")
    # post-update stats must allow a prune read to find the new value
    got = read_versioned_table(
        spark, root, prune=[("v", 9999.0, None)]
    ).collect()
    assert [r.k for r in got] == [7]
    # and the old value must NOT be found (stats were refreshed, not
    # stale-carried)
    assert (
        read_versioned_table(spark, root, eq=[("v", 7.0)]).count() == 0
    )


def test_update_db_transactional_across_tables(spark, tmp_path):
    db = str(tmp_path / "db")
    df = _frame(spark)
    write_versioned_db(
        spark, db,
        {"a": df, "b": df.withColumnRenamed("v", "w")},
        {"a": "k", "b": "k"},
        n_buckets=4,
    )
    before_tok = _db_manifest(db)["token"]
    update_versioned_db(
        spark, db,
        {
            "a": {"set": {"v": "v + 1"}, "where": "g = 2"},
            "b": {"set": {"w": F.lit(-1.0)}, "eq": [("g", 4)]},
        },
    )
    m = _db_manifest(db)
    # ONE transaction: both tables' touched buckets share the new token
    gens_a = {g for g in m["tables"]["a"]["buckets"].values()}
    gens_b = {g for g in m["tables"]["b"]["buckets"].values()}
    assert f"gen-{m['token']}" in gens_a and f"gen-{m['token']}" in gens_b
    a = _as_map(read_versioned_db(spark, db, "a"), "v")
    b = _as_map(read_versioned_db(spark, db, "b"), "w")
    assert a[2] == (3.0,) and a[1] == (1.0,)
    assert b[4] == (-1.0,) and b[1] == (1.0,)
    # pre-transaction snapshot intact
    olda = _as_map(read_versioned_db(spark, db, "a", token=before_tok), "v")
    assert olda[2] == (2.0,)


def test_update_db_validates_specs(spark, tmp_path):
    db = str(tmp_path / "db")
    df = _frame(spark, n=20)
    write_versioned_db(spark, db, {"a": df}, {"a": "k"}, n_buckets=2)
    with pytest.raises(ValueError, match="no table"):
        update_versioned_db(spark, db, {"zz": {"set": {"v": "1"}}})
    with pytest.raises(ValueError, match="'set' mapping"):
        update_versioned_db(spark, db, {"a": {"where": "g = 1"}})
    with pytest.raises(ValueError, match="unknown update spec"):
        update_versioned_db(
            spark, db, {"a": {"set": {"v": "1"}, "wher": "g = 1"}}
        )


def test_eq_consults_range_stats_without_blooms(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark)
    write_versioned_table(df, root, "k", n_buckets=8, stats_cols=["g"])
    m = _bucket_manifest(root)
    # out-of-range equality: every bucket's [min,max] excludes 99
    assert _skipping_keep(spark, root, m, None, None, [("g", 99)]) == set()
    assert read_versioned_table(spark, root, eq=[("g", 99)]).count() == 0
    # in-range equality stays exact
    assert (
        read_versioned_table(spark, root, eq=[("g", 3)]).count()
        == df.where("g = 3").count()
    )
    # cross-family literal: conservative (no pruning) but still exact
    assert (
        read_versioned_table(spark, root, eq=[("g", "3")]).count()
        == df.where("g = '3'").count()
    )


def test_is_null_consults_null_counts(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 50 == 0, None).otherwise(F.col("id") % 7).alias("g"),
        (F.col("id") % 3).alias("z"),
    )
    write_versioned_table(df, root, "k", n_buckets=8, stats_cols=["g", "z"])
    m = _bucket_manifest(root)
    # z is never null: every bucket proves nulls == 0 and is skipped
    assert _skipping_keep(spark, root, m, None, None, [("z", None)]) == set()
    assert read_versioned_table(spark, root, eq=[("z", None)]).count() == 0
    # g has nulls: result exact
    assert (
        read_versioned_table(spark, root, eq=[("g", None)]).count()
        == df.where("g is null").count()
    )


def test_update_then_delete_compose_on_chain(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=100)
    write_versioned_table(df, root, "k", n_buckets=4, stats_cols=["g"])
    update_versioned(spark, root, {"v": F.lit(0.0)}, prune=[("g", 6, 6)])
    delete_from_versioned(
        spark, root, spark.createDataFrame([(6,), (7,)], "k long"), "k"
    )
    got = _as_map(read_versioned_table(spark, root), "v")
    assert 6 not in got and 7 not in got
    assert got[13] == (0.0,)  # g = 6
    assert got[14] == (14.0,)


def test_update_set_columns_see_pre_update_values(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _frame(spark, n=60)
    write_versioned_table(df, root, "k", n_buckets=4)
    # swap two columns: both expressions must read the ORIGINAL row
    update_versioned(
        spark, root, {"g": "v", "v": "g"}, where="k < 10"
    )
    got = _as_map(read_versioned_table(spark, root), "g", "v")
    assert got[3] == (3.0, 3 % 7 * 1.0)  # g <- old v, v <- old g
    assert got[20] == (20 % 7, 20.0)  # untouched


def test_update_predicate_on_set_column_applies_to_all_sets(spark, tmp_path):
    root = str(tmp_path / "t")
    write_versioned_table(_frame(spark, n=60), root, "k", n_buckets=4)
    # predicate references a SET column: every other SET expression
    # must still fire on exactly the matched rows
    update_versioned(
        spark, root,
        {"g": F.lit(99), "s": F.lit("hit")},
        where="g = 3",
    )
    got = _as_map(read_versioned_table(spark, root), "g", "s")
    assert got[3] == (99, "hit")
    assert got[10] == (99, "hit")
    assert got[4] == (4 % 7, "s4")


def test_eq_stats_tier_is_family_gated(spark, tmp_path):
    import datetime

    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, datetime.date(2024, 7, 1 + i % 28)) for i in range(200)],
        "k long, d date",
    )
    write_versioned_table(df, root, "k", n_buckets=4, stats_cols=["d"])
    # a NON-CANONICAL date string: Spark's residual casts it to DATE
    # and matches; a lexicographic stats compare would wrongly prove
    # absence — the family gate must keep every bucket
    got = read_versioned_table(spark, root, eq=[("d", "2024-7-1")])
    assert got.count() == df.where("d = '2024-7-1'").count() > 0
    # in-family (a real date literal) still prunes exactly
    got2 = read_versioned_table(
        spark, root, eq=[("d", datetime.date(2024, 7, 2))]
    )
    assert got2.count() == df.where("d = DATE '2024-07-02'").count() > 0
    assert (
        read_versioned_table(
            spark, root, eq=[("d", datetime.date(2030, 1, 1))]
        ).count()
        == 0
    )
