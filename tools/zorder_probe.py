"""Z-order probe: what does multi-dimensional clustering buy a 2-d
box predicate that a linear sort cannot?

Table: n rows, 64 buckets, two INDEPENDENT uniform columns x, y in
[0, 1e6) — exactly the shape where manifest-level bucket stats prune
nothing (uniform columns span every bucket) and row-group skipping is
the only lever. Query: a box covering 10% of the domain per dim (1% combined —
the shape where a linear x-sort still reads 10% of every file while
the z-curve localizes both dims)
(x in [0, 1e5) AND y in [0, 1e5)), count+sum aggregate, best-of-3.

Compared layouts (same data, three optimize rewrites):
1. unsorted (the post-merge steady state);
2. cluster_by('x')  — linear sort: row groups tight in x, y spans
   the full domain, so the y conjunct prunes nothing inside a file;
3. zorder_by(['x','y']) — Morton interleave: row groups tight in
   BOTH dims.

parquet.block.size is lowered to 128 KiB so each bucket file has
dozens of row groups — emulating the 100s of row groups a real
~1 GB file carries at fleet scale (the structural row-group-match
counts are the scale-transferable metric; local wall times are
scan-setup dominated).

Usage: python tools/zorder_probe.py [n_rows]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        optimize_versioned,
        read_versioned_table,
        write_versioned_table,
    )

    spark = get_spark("zorder_probe", cpus=32)
    spark._jsc.hadoopConfiguration().setInt("parquet.block.size", 128 << 10)
    d = tempfile.mkdtemp(prefix="zorder_probe_")
    path = os.path.join(d, "t")
    try:
        df = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("Id"),
            F.pmod(F.xxhash64(F.concat(F.lit("x"), F.col("id"))),
                   F.lit(10**6)).cast("double").alias("x"),
            F.pmod(F.xxhash64(F.concat(F.lit("y"), F.col("id"))),
                   F.lit(10**6)).cast("double").alias("y"),
        )
        write_versioned_table(df, path, "Id", 64)

        def box_query():
            return (
                read_versioned_table(spark, path)
                .where((F.col("x") < 1e5) & (F.col("y") < 1e5))
                .agg(F.count("*"), F.sum("x"), F.sum("y"))
                .collect()[0][0]
            )

        def rg_matching():
            # row groups whose [min,max] boxes intersect the query box
            # — what parquet's predicate pushdown must read; the
            # scale-independent structural metric (wall at local
            # fixture sizes is scan-setup dominated)
            import pyarrow.parquet as pq

            from amaxa_spark.sources.catalog import (
                MERGE_BUCKET_COL,
                _bucket_manifest,
            )
            mf = _bucket_manifest(path)
            total = hit = 0
            for b, gen in mf["buckets"].items():
                bdir = os.path.join(path, gen, f"{MERGE_BUCKET_COL}={b}")
                for fname in os.listdir(bdir):
                    if not fname.endswith(".parquet"):
                        continue
                    meta = pq.ParquetFile(
                        os.path.join(bdir, fname)).metadata
                    idx = {
                        meta.row_group(0).column(i).path_in_schema: i
                        for i in range(meta.row_group(0).num_columns)
                    }
                    for g in range(meta.num_row_groups):
                        rg = meta.row_group(g)
                        total += 1
                        if (rg.column(idx["x"]).statistics.min < 1e5
                                and rg.column(idx["y"]).statistics.min < 1e5):
                            hit += 1
            return hit, total

        t_uns, rows = best_of(box_query)
        rg_uns = rg_matching()
        t0 = time.time()
        optimize_versioned(spark, path, cluster_by=["x"])
        t_cl_rewrite = time.time() - t0
        t_lin, rows_l = best_of(box_query)
        rg_lin = rg_matching()
        t0 = time.time()
        optimize_versioned(spark, path, zorder_by=["x", "y"])
        t_z_rewrite = time.time() - t0
        t_z, rows_z = best_of(box_query)
        rg_z = rg_matching()
        assert rows == rows_l == rows_z, (rows, rows_l, rows_z)
        print(
            f"n={n}, 64 buckets, 10%x10% box ({rows} rows): "
            f"unsorted {t_uns:.2f}s; cluster_by(x) {t_lin:.2f}s "
            f"({t_uns / t_lin:.1f}x, rewrite {t_cl_rewrite:.0f}s); "
            f"zorder(x,y) {t_z:.2f}s ({t_uns / t_z:.1f}x vs unsorted, "
            f"{t_lin / t_z:.1f}x vs linear; rewrite {t_z_rewrite:.0f}s); "
            f"row groups matching box: unsorted {rg_uns[0]}/{rg_uns[1]}, "
            f"linear {rg_lin[0]}/{rg_lin[1]}, zorder {rg_z[0]}/{rg_z[1]}"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
