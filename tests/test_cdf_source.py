"""Streaming source over the commit chain (streaming/cdf_source.py):
change-data-feed micro-batches + exactly-once table-to-table
replication, converging to diff-equality under concurrent writers —
round-11 item #4's done-criterion test."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from amaxa_spark.sources.catalog import (
    ConcurrentMergeError,
    alter_versioned_rename_column,
    delete_from_versioned,
    merge_into_versioned,
    read_versioned_table,
    update_versioned,
    write_versioned_table,
    _bucket_manifest,
    _commit_chain_head,
)
from amaxa_spark.streaming.cdf_source import (
    changes_since,
    read_versioned_stream,
    replicate_versioned_stream,
)


def _frame(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )


def _rows(spark, path):
    return sorted(
        (r.k, r.v)
        for r in read_versioned_table(spark, path).select("k", "v").collect()
    )


def test_changes_since_birth_and_increments(spark, tmp_path):
    src = str(tmp_path / "src")
    write_versioned_table(_frame(spark), src, "k", n_buckets=4)
    feed, seq = changes_since(spark, src, None)
    assert seq == _commit_chain_head(src)[0]
    assert feed.where("_change_type = 'insert'").count() == 40
    # no new commits: None
    assert changes_since(spark, src, seq) is None
    # a merge produces exactly its pre/post pair
    merge_into_versioned(
        spark, src,
        spark.createDataFrame([(3, -1.0)], "k long, v double"), "k", ["v"],
    )
    feed2, seq2 = changes_since(spark, src, seq)
    got = sorted(
        (r._change_type, r.k, r.v) for r in feed2.collect()
    )
    assert got == [
        ("update_postimage", 3, -1.0), ("update_preimage", 3, 3.0),
    ]
    assert seq2 == seq + 1


def test_read_versioned_stream_generator(spark, tmp_path):
    src = str(tmp_path / "src")
    write_versioned_table(_frame(spark, 10), src, "k", n_buckets=2)
    merge_into_versioned(
        spark, src,
        spark.createDataFrame([(1, 9.0)], "k long, v double"), "k", ["v"],
    )
    batches = list(
        read_versioned_stream(spark, src, idle_stop_after=1,
                              poll_interval_s=0.01)
    )
    assert len(batches) == 1  # birth feed collapses everything so far
    feed, seq = batches[0]
    assert feed.count() == 10  # snapshot-as-inserts
    # resuming from that seq sees only what lands after
    delete_from_versioned(
        spark, src, spark.createDataFrame([(2,)], "k long"), "k"
    )
    batches = list(
        read_versioned_stream(spark, src, from_seq=seq,
                              idle_stop_after=1, poll_interval_s=0.01)
    )
    assert len(batches) == 1
    assert [
        (r._change_type, r.k) for r in batches[0][0].collect()
    ] == [("delete", 2)]


def test_replication_is_exactly_once_and_resumable(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_versioned_table(_frame(spark), src, "k", n_buckets=4)
    # seed + catch-up
    replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=1, poll_interval_s=0.01
    )
    assert _rows(spark, dst) == _rows(spark, src)
    marker = _bucket_manifest(dst)["streams"]["rep"]
    assert marker == _commit_chain_head(src)[0]
    # more source commits of every kind — incl. merge-on-read ones
    merge_into_versioned(
        spark, src,
        spark.createDataFrame([(100, 1.5)], "k long, v double"),
        "k", ["v"], not_matched="insert",
    )
    update_versioned(spark, src, {"v": "v * 10"}, where="k = 5", mode="dv")
    delete_from_versioned(
        spark, src, spark.createDataFrame([(6,)], "k long"), "k", mode="dv"
    )
    replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=1, poll_interval_s=0.01
    )
    assert _rows(spark, dst) == _rows(spark, src)
    # idle re-run applies nothing (exactly-once marker)
    res = replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=2, poll_interval_s=0.01
    )
    assert res["applied"] == 0


def test_replication_survives_rename_between_polls(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_versioned_table(_frame(spark, 12), src, "k", n_buckets=2)
    replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=1, poll_interval_s=0.01
    )
    # a metadata-only rename between polls must not fabricate changes;
    # the destination renames too (schema follows the source)
    alter_versioned_rename_column(src, "v", "val", spark=spark)
    feed, seq = changes_since(
        spark, src, _bucket_manifest(dst)["streams"]["rep"]
    )
    assert feed.count() == 0  # bytes did not change
    alter_versioned_rename_column(dst, "v", "val", spark=spark)
    merge_into_versioned(
        spark, src,
        spark.createDataFrame([(3, -3.0)], "k long, val double"),
        "k", ["val"],
    )
    replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=1, poll_interval_s=0.01
    )
    got = {
        r.k: r.val for r in read_versioned_table(spark, dst)
        .where("k = 3").collect()
    }
    assert got == {3: -3.0}


# fast default sibling: test_replication_is_exactly_once_and_resumable
@pytest.mark.slow
def test_convergence_under_concurrent_writers(spark, tmp_path):
    """The done-criterion: a pipeline streaming src → dst converges to
    diff-equality while writers keep committing (merges, rewrite and
    merge-on-read deletes/updates) — every batch lands exactly once
    and the final states are row-identical after the writers stop."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_versioned_table(_frame(spark, 60), src, "k", n_buckets=4)
    stop_flag = {"stop": False}
    errors = []

    def writer():
        try:
            for i in range(6):
                merge_into_versioned(
                    spark, src,
                    spark.createDataFrame(
                        [(200 + i, float(i))], "k long, v double"
                    ),
                    "k", ["v"], not_matched="insert",
                )
                update_versioned(
                    spark, src, {"v": "v + 1"}, where=f"k = {i}",
                    mode="dv" if i % 2 else "rewrite",
                )
                delete_from_versioned(
                    spark, src,
                    spark.createDataFrame([(30 + i,)], "k long"), "k",
                    mode="dv" if i % 2 else "rewrite",
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            stop_flag["stop"] = True

    t = threading.Thread(target=writer)
    t.start()
    # consume while the writer runs, then drain the tail
    replicate_versioned_stream(
        spark, src, dst, "rep", poll_interval_s=0.05,
        stop=lambda: stop_flag["stop"],
    )
    t.join()
    assert errors == []
    replicate_versioned_stream(
        spark, src, dst, "rep", idle_stop_after=2, poll_interval_s=0.05
    )
    assert _rows(spark, dst) == _rows(spark, src)
    assert _bucket_manifest(dst)["streams"]["rep"] == _commit_chain_head(src)[0]
