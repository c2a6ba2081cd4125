"""Data-skipping probe for the versioned bucket layout: measure what
manifest-level stats pruning, exact pk-hash bucket lookup, and
cluster_by row-group skipping actually buy — and where the hash layout
honestly limits them.

Table: N rows (default 10M), 256 buckets, columns:

- ``corr``   — value derived from the row's pk-hash bucket
  (bucket*1e6 + i): the bucket-correlated case where per-bucket
  min/max genuinely discriminates;
- ``uni``    — uniform random value: the anti-case (every bucket
  spans the full range, stats prune NOTHING — stated, not hidden);
- ``sparse`` — non-null in ~1/16 of buckets: the sparse-attribute
  case (IS NOT NULL pruning).

Timed comparisons (each best-of-3 on a count+sum aggregate):

1. range filter on ``corr``: pruned read vs full read + filter
   (expect ~n_buckets/width reduction in buckets listed AND wall);
2. the same on ``uni`` (expect NO bucket reduction — honesty check);
3. IS NOT NULL on ``sparse``: pruned vs full;
4. pk_in 8-key point lookup vs full-scan isin filter;
5. selective range scan on a cluster_by-sorted table vs unsorted
   (row-group skipping inside buckets; parquet block size lowered so
   the local fixture actually has multiple row groups per file).

Usage: python tools/skipping_probe.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(f, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        out = f()
        times.append(time.time() - t0)
    return min(times), out


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        optimize_versioned,
        read_versioned_table,
        stats_prune_buckets,
        write_versioned_table,
        _bucket_manifest,
    )

    spark = get_spark("skipping_probe", cpus=32)
    # several row groups per compacted bucket file, so probe 5 can
    # show row-group skipping at local fixture sizes
    spark._jsc.hadoopConfiguration().setInt("parquet.block.size", 1 << 20)
    root = tempfile.mkdtemp(prefix="skip_probe_")
    path = os.path.join(root, "t")
    try:
        b = F.pmod(F.xxhash64(F.col("Id").cast("string")), F.lit(n_buckets))
        df = (
            spark.range(n_rows)
            .select(F.concat(F.lit("k"), F.col("id")).alias("Id"),
                    F.col("id").alias("i"))
            .select(
                "Id",
                (b * 1_000_000 + F.col("i") % 1_000_000).alias("corr"),
                (F.xxhash64(F.col("Id")) % 1_000_000).alias("uni"),
                F.when(F.pmod(b, F.lit(16)) == 0, F.col("i").cast("double"))
                .otherwise(F.lit(None).cast("double"))
                .alias("sparse"),
            )
        )
        t0 = time.time()
        mf = write_versioned_table(
            df, path, "Id", n_buckets,
            stats_cols=["corr", "uni", "sparse"],
        )
        print(f"init+stats harvest: {time.time() - t0:.2f}s "
              f"({n_rows} rows, {n_buckets} buckets)")

        def agg(d):
            return d.agg(F.count(F.lit(1)), F.sum("corr")).collect()

        # 1. bucket-correlated range: ~4 buckets wide
        lo, hi = 17 * 1_000_000, 20 * 1_000_000 + 999_999
        kept = stats_prune_buckets(mf, [("corr", lo, hi)])
        t_p, _ = best_of(lambda: agg(
            read_versioned_table(spark, path, prune=[("corr", lo, hi)])))
        t_f, _ = best_of(lambda: agg(
            read_versioned_table(spark, path).where(
                F.col("corr").between(lo, hi))))
        print(f"corr range: pruned {len(kept)}/{n_buckets} buckets "
              f"{t_p:.2f}s vs full {t_f:.2f}s ({t_f / t_p:.1f}x)")

        # 2. uniform column: stats must NOT prune (honesty check)
        kept_u = stats_prune_buckets(mf, [("uni", 0, 1000)])
        t_pu, _ = best_of(lambda: agg(
            read_versioned_table(spark, path, prune=[("uni", 0, 1000)])))
        print(f"uni range: pruned keeps {len(kept_u)}/{n_buckets} buckets "
              f"(expected all — uniform data defeats bucket stats), "
              f"{t_pu:.2f}s")

        # 3. sparse attribute IS NOT NULL
        kept_s = stats_prune_buckets(mf, [("sparse", None, None)])
        t_ps, _ = best_of(lambda: agg(
            read_versioned_table(spark, path,
                                 prune=[("sparse", None, None)])))
        t_fs, _ = best_of(lambda: agg(
            read_versioned_table(spark, path).where(
                F.col("sparse").isNotNull())))
        print(f"sparse not-null: pruned {len(kept_s)}/{n_buckets} buckets "
              f"{t_ps:.2f}s vs full {t_fs:.2f}s ({t_fs / t_ps:.1f}x)")

        # 4. point lookup
        keys = [f"k{i}" for i in range(0, n_rows, max(1, n_rows // 8))][:8]
        t_pk, rows = best_of(lambda: read_versioned_table(
            spark, path, pk_in=keys).collect())
        t_fk, _ = best_of(lambda: read_versioned_table(spark, path).where(
            F.col("Id").isin(keys)).collect())
        print(f"pk_in 8-key lookup: {t_pk:.2f}s vs full-scan isin "
              f"{t_fk:.2f}s ({t_fk / t_pk:.1f}x, {len(rows)} rows)")

        # 5. cluster_by row-group skipping inside buckets
        sel = lambda: read_versioned_table(spark, path).where(
            (F.col("uni") >= 0) & (F.col("uni") <= 2000)
        ).agg(F.count(F.lit(1))).collect()
        t_uns, _ = best_of(sel)
        t0 = time.time()
        optimize_versioned(spark, path, cluster_by=["uni"])
        t_opt = time.time() - t0
        t_cl, _ = best_of(sel)
        print(f"cluster_by('uni') rewrite {t_opt:.1f}s; selective scan "
              f"{t_uns:.2f}s unsorted -> {t_cl:.2f}s clustered "
              f"({t_uns / t_cl:.1f}x via parquet row-group stats)")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
