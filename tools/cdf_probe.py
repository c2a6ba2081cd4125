"""Change-data-feed probe: show that `diff_versioned` cost tracks the
CHANGED-bucket count, not the table size — the property that makes a
computed CDF viable at 100 TB (a merge that touched 3 of 4096 buckets
reads 3 buckets twice, never the table).

Table: N rows (default 10M), 256 buckets. Three diffs are timed over
the SAME snapshot pair structure:

1. narrow merge  — updates confined to ~3 buckets (keys pre-filtered
   by the same pk-hash the layout uses);
2. wide merge    — the same number of updated ROWS spread over all
   256 buckets (worst case for a computed CDF: change volume is tiny
   but every bucket is touched);
3. full rewrite  — every bucket changed generation.

Expected shape: (1) is near-constant regardless of N's total size,
(3) costs two full table reads, and (2) sits near (3) — which is the
honest caveat the docs carry: the unit of change is the BUCKET, so
scattered point updates degrade to a full diff. Bucket counts should
be sized so one bucket ≈ one task (the layout default at real scale).

Usage: python tools/cdf_probe.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.sources.catalog import (
    diff_versioned,
    merge_into_versioned,
    write_versioned_table,
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("cdf-probe", cpus=16)
    import tempfile

    root = tempfile.mkdtemp(prefix="cdf_probe_")
    path = os.path.join(root, "vt")

    base = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("pk"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            (F.col("id") % 1000).alias("grp"),
        )
    )
    t0 = time.time()
    m0 = write_versioned_table(base, path, pk="pk", n_buckets=n_buckets)
    print(f"init: {n_rows:,} rows, {n_buckets} buckets, "
          f"{time.time() - t0:.1f}s")

    bucket_of = F.pmod(F.xxhash64(F.col("pk").cast("string")),
                       F.lit(n_buckets)).cast("int")

    def timed_diff(tag, tf, tt):
        t = time.time()
        d = diff_versioned(spark, path, tf, tt)
        n = d.count()
        dt = time.time() - t
        changed = sum(
            1 for b in set(m_by[tf]["buckets"]) | set(m_by[tt]["buckets"])
            if m_by[tf]["buckets"].get(b) != m_by[tt]["buckets"].get(b)
        )
        print(f"{tag}: {changed}/{n_buckets} buckets changed, "
              f"{n:,} change rows, diff {dt:.2f}s")
        return dt

    # 1. narrow merge: 10k updated rows all inside buckets {0,1,2}
    narrow_keys = base.where(bucket_of < 3).limit(10_000)
    upd = narrow_keys.select("pk", F.lit("updated").alias("payload"))
    m1 = merge_into_versioned(spark, path, upd, pk="pk", set_cols=["payload"])

    # 2. wide merge: 10k updated rows spread across every bucket
    wide = (
        base.where((F.col("pk") % (n_rows // 10_000)) == 7)
        .select("pk", F.lit("updated2").alias("payload"))
    )
    m2 = merge_into_versioned(spark, path, wide, pk="pk", set_cols=["payload"])

    # 3. full rewrite
    m3 = write_versioned_table(
        base.withColumn("payload", F.lit("rewritten")),
        path, pk="pk", n_buckets=n_buckets,
    )

    m_by = {m["token"]: m for m in (m0, m1, m2, m3)}
    t_narrow = timed_diff("narrow (3-bucket merge)", m0["token"], m1["token"])
    t_wide = timed_diff("wide (all-bucket merge)", m1["token"], m2["token"])
    t_full = timed_diff("full rewrite", m2["token"], m3["token"])
    print(f"narrow/full ratio: {t_narrow / t_full:.3f} "
          f"(bucket share: {3 / n_buckets:.3f})")
    print(f"wide/full ratio: {t_wide / t_full:.3f} (expected near 1: "
          "scattered updates touch every bucket)")

    import shutil

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
