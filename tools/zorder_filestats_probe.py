"""Multi-dimensional FILE-tier probe: what Z-ORDER range-splitting
buys the per-file sidecar stats on a 2-D box predicate — the round-9
composition of three features probed separately until now
(zorder_by, files_per_bucket, file_stats).

Setup: N rows, two INDEPENDENT uniform dims u1/u2 (bucket tier blind
for both), file_stats on both. Three layouts of the same data:

1. linear cluster_by=[u1], files_per_bucket=k — tight per-file u1
   ranges, u2 spans everything per file;
2. zorder_by=[u1, u2], files_per_bucket=k — per-file ranges tight in
   BOTH dims at once (Morton order);
3. unsplit zorder (files_per_bucket=1) — the pre-round-9 state where
   only parquet row-group stats inside one big file can help.

Measured: the planner's file listing for a box predicate
(u1 in 1% x u2 in 1%) under each layout, plus best-of-3 agg wall.

Usage: python tools/zorder_filestats_probe.py [n_rows] [n_buckets] [k]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(f, n=3):
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return min(ts)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources import catalog as C

    spark = get_spark("zorder-filestats-probe")
    base = tempfile.mkdtemp(prefix="zfsprobe-")
    df = spark.range(n_rows).select(
        F.col("id").alias("pk"),
        (F.abs(F.xxhash64("id")) % 1_000_000).cast("double").alias("u1"),
        (F.abs(F.xxhash64("id", F.lit(7))) % 1_000_000)
        .cast("double")
        .alias("u2"),
    )
    box = [("u1", 400_000.0, 410_000.0), ("u2", 400_000.0, 410_000.0)]

    def build(name, **opt):
        root = os.path.join(base, name)
        C.write_versioned_table(
            df.repartition(32), root, "pk", n_buckets=n_buckets,
            stats_cols=["u1", "u2"], file_stats=True,
        )
        C.optimize_versioned(spark, root, **opt)
        m = C._bucket_manifest(root)
        keep = C._skipping_keep(spark, root, m, box, None, None)
        paths = C._pruned_bucket_paths(root, m, keep, box, None)
        nf = sum(1 for p in paths if p.endswith(".parquet"))
        total = sum(
            len(os.listdir(os.path.join(root, g, f"__mb={b}")))
            for b, g in m["buckets"].items()
        )
        w = best_of(
            lambda: spark.read.parquet(*paths)
            .where(
                (F.col("u1").between(box[0][1], box[0][2]))
                & (F.col("u2").between(box[1][1], box[1][2]))
            )
            .agg(F.count("*"), F.sum("u1"))
            .collect()
        )
        print(f"{name:28s} files listed {nf:4d}/{total:4d}  "
              f"box agg {w:.2f}s")
        return nf

    n_lin = build("linear-u1-split", cluster_by=["u1"], files_per_bucket=k)
    n_z = build("zorder-u1u2-split", zorder_by=["u1", "u2"], files_per_bucket=k)
    n_z1 = build("zorder-unsplit", zorder_by=["u1", "u2"])
    print(f"zorder+split lists {n_lin / max(n_z, 1):.1f}x fewer files "
          f"than linear+split on the 2-D box; unsplit zorder lists "
          f"{n_z1} (whole buckets - the file tier needs the split)")


if __name__ == "__main__":
    main()
