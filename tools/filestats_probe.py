"""FILE-tier skipping probe: what per-file sidecar stats buy INSIDE
pk-hash buckets once OPTIMIZE range-splits them (`files_per_bucket`).

The scenario the fine tier exists for: a column (`uni` — uniform) that
is bucket-UNCORRELATED, so the manifest's bucket tier prunes nothing,
but after `optimize_versioned(cluster_by=["uni"], files_per_bucket=k)`
every bucket is k sorted, range-disjoint files — a narrow range
predicate should then read ~1/k of each bucket's bytes via the
sidecar, with zero bucket-tier help.

Measured (best-of-3 wall on a count+sum aggregate):

1. narrow `uni` range, file tier ON (file_stats sidecar consumed)
   vs OFF (same table re-read with the flag stripped from the
   manifest dict — identical bytes, bucket-tier only);
2. the file count actually listed by the planner in both modes;
3. a `pk`-key eq probe for regression (file tier must not slow the
   paths the bucket tier already nails).

Usage: python tools/filestats_probe.py [n_rows] [n_buckets] [k_files]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(f, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        f()
        times.append(time.time() - t0)
    return min(times)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k_files = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources import catalog as C

    spark = get_spark("filestats-probe")
    root = os.path.join(tempfile.mkdtemp(prefix="fsprobe-"), "t")

    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        # uniform: bucket-uncorrelated by construction (hash of id)
        (F.abs(F.xxhash64("id")) % 1_000_000).cast("double").alias("uni"),
    )
    t0 = time.time()
    C.write_versioned_table(
        df.repartition(32), root, "k", n_buckets=n_buckets,
        stats_cols=["uni"], file_stats=True,
    )
    print(f"init: {time.time() - t0:.1f}s ({n_rows} rows, {n_buckets} buckets)")
    t0 = time.time()
    C.optimize_versioned(
        spark, root, cluster_by=["uni"], files_per_bucket=k_files
    )
    print(f"optimize cluster_by=uni files_per_bucket={k_files}: "
          f"{time.time() - t0:.1f}s")

    m = C._bucket_manifest(root)
    m_off = {key: v for key, v in m.items() if key != "file_stats"}
    lo, hi = 400_000.0, 410_000.0  # 1% of the uni range
    prune = [("uni", lo, hi)]

    keep = C._skipping_keep(spark, root, m, prune, None, None)
    p_on = C._pruned_bucket_paths(root, m, keep, prune, None)
    p_off = C._pruned_bucket_paths(root, m_off, keep, prune, None)
    n_files_on = sum(1 for p in p_on if p.endswith(".parquet"))
    print(f"planner paths: file-tier ON {len(p_on)} "
          f"({n_files_on} files) vs OFF {len(p_off)} whole dirs "
          f"of ~{k_files} files each")

    def agg(paths):
        d = spark.read.parquet(*paths).where(
            (F.col("uni") >= lo) & (F.col("uni") <= hi)
        )
        d.agg(F.count("*"), F.sum("uni")).collect()

    t_on = best_of(lambda: agg(p_on))
    t_off = best_of(lambda: agg(p_off))
    print(f"1% range agg: file tier ON {t_on:.2f}s vs OFF {t_off:.2f}s "
          f"({t_off / max(t_on, 1e-9):.1f}x)")

    # regression guard: a pk point lookup must stay bucket-exact and fast
    t_pk = best_of(
        lambda: C.read_versioned_table(spark, root, pk_in=[12345]).collect()
    )
    print(f"pk_in point lookup with file tier enabled: {t_pk:.2f}s")


if __name__ == "__main__":
    main()
