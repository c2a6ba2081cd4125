"""RENAME COLUMN scale + concurrency probe.

Part 1 — metadata-only at scale: a 10M-row stats-enabled versioned
table is renamed; the probe asserts ZERO parquet files are touched
(identical path+mtime set), times the commit, and then proves the
renamed table still behaves: an exact range-pruned read and a
selective UPDATE addressed by the NEW name (bucket skipping driving
the rewrite set through the renamed stats keys).

Part 2 — cross-process race: a separate OS process (own JVM) merges
batches in a loop while the parent process repeatedly renames a spare
column back and forth on the same chain. The merge retries
ConcurrentMergeError like a real writer; every rename lands (its CAS
loop re-validates against the fresh head). Afterwards: dense chain,
every merged row present under the final naming, final logical schema
matches the last rename.

Usage: python tools/rename_probe.py [rows] [merge_batches]
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def merge_worker(path: str, batches: int, outdir: str) -> None:
    os.environ.setdefault("AMAXA_SPARK_DRIVER_MEM", "4g")
    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        ConcurrentMergeError,
        merge_into_versioned,
    )

    spark = get_spark("rename_probe_merge", cpus=4)
    retries = 0
    for i in range(batches):
        rows = [(100_000_000 + i * 100 + j, float(i)) for j in range(100)]
        # the value column is already renamed v -> score by part 1;
        # a real writer addresses the CURRENT logical name
        upd = spark.createDataFrame(rows, "k long, score double")
        while True:
            try:
                merge_into_versioned(
                    spark, path, upd, pk="k", set_cols=["score"],
                    not_matched="insert",
                )
                break
            except ConcurrentMergeError:
                retries += 1
    with open(os.path.join(outdir, "merge.json"), "w") as f:
        json.dump({"retries": retries, "batches": batches}, f)
    spark.stop()


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.environ.setdefault("AMAXA_SPARK_DRIVER_MEM", "8g")
    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        COMMITS_DIR,
        alter_versioned_rename_column,
        read_versioned_table,
        update_versioned,
        write_versioned_table,
        _bucket_manifest,
    )

    spark = get_spark("rename_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    tmp = tempfile.mkdtemp(prefix="rename_probe_")
    path = os.path.join(tmp, "t")

    # ---- part 1: metadata-only at scale ----
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 1_000_000 * 1.0).alias("v"),
        (F.col("id") % 7).alias("tag"),
    )
    t0 = time.time()
    write_versioned_table(df, path, "k", n_buckets=32, stats_cols=["v"])
    t_init = time.time() - t0

    def file_state():
        return sorted(
            (p, os.path.getmtime(p))
            for p in glob.glob(os.path.join(path, "gen-*", "*=*", "*.parquet"))
        )

    before = file_state()
    t0 = time.time()
    alter_versioned_rename_column(path, "v", "score", spark)
    t_rename = time.time() - t0
    assert file_state() == before, "rename touched parquet files"

    # exact pruned read under the new name
    lo, hi = 990_000.0, 1_000_000.0
    t0 = time.time()
    n_pruned = read_versioned_table(
        spark, path, prune=[("score", lo, hi)]
    ).count()
    t_read = time.time() - t0
    n_plain = read_versioned_table(spark, path).where(
        (F.col("score") >= lo) & (F.col("score") <= hi)
    ).count()
    assert n_pruned == n_plain, (n_pruned, n_plain)

    # selective UPDATE by the new name
    t0 = time.time()
    update_versioned(
        spark, path, {"score": F.col("score") + 0.5},
        where="k % 1000000 = 0",
    )
    t_update = time.time() - t0
    assert read_versioned_table(spark, path).where("k = 0").select(
        "score"
    ).first()[0] == 0.5

    # ---- part 2: cross-process rename vs merge race ----
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=merge_worker, args=(path, batches, tmp))
    p.start()
    renames = 0
    cur = "tag"
    while p.is_alive():
        nxt = "tag2" if cur == "tag" else "tag"
        alter_versioned_rename_column(path, cur, nxt, spark)
        cur = nxt
        renames += 1
        time.sleep(0.3)
    p.join()
    assert p.exitcode == 0, "merge worker died"
    with open(os.path.join(tmp, "merge.json")) as f:
        mrec = json.load(f)

    seqs = sorted(
        int(f[: -len(".json")])
        for f in os.listdir(os.path.join(path, COMMITS_DIR))
        if f.endswith(".json")
    )
    assert seqs == list(range(len(seqs))), "chain has holes"
    head = read_versioned_table(spark, path)
    assert cur in head.columns and ("tag" not in head.columns or cur == "tag")
    n_merged = head.where("k >= 100000000").count()
    assert n_merged == batches * 100, (n_merged, batches * 100)
    m = _bucket_manifest(path)

    print(json.dumps({
        "rows": n_rows,
        "init_s": round(t_init, 1),
        "rename_s": round(t_rename, 4),
        "files_untouched": True,
        "pruned_read_s": round(t_read, 2),
        "pruned_read_rows": n_pruned,
        "update_by_new_name_s": round(t_update, 1),
        "race_renames_landed": renames,
        "race_merge_batches": mrec["batches"],
        "race_merge_rebase_retries": mrec["retries"],
        "final_logical_tag": cur,
        "chain_dense": True,
        "merged_rows_all_present": True,
        "head_seq": int(m["seq"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
