"""Materialized-view refresh probe: show that an incremental
`refresh_aggregate_versioned` costs CHANGE volume, not view/source
size — the property that makes a maintained aggregate viable where a
nightly full GROUP BY recompute is a full 100 TB scan.

Source: N rows (default 2M), 256 buckets, 2000 groups. Timed:

1. full build       — the unavoidable first aggregate + view write;
2. narrow refresh   — a merge updating 5000 rows confined to ~3
   source buckets (keys pre-filtered by the layout's own pk-hash,
   like cdf_probe), then ONE incremental refresh end-to-end
   (diff of 3 source buckets + delta agg + affected-bucket view
   reads + atomic CDC-apply commit);
3. recompute floor  — one full GROUP BY over the source head
   (aggregate + count only, NO view write): the lower bound any
   non-incremental consumer pays per refresh.

Expected shape: (2) is near-constant in N — its inputs are 3 source
buckets and the view buckets of the touched groups; (3) grows with N.
Run at two sizes to see the divergence; the honest caveat mirrors the
CDF probe's: updates SCATTERED over all source buckets make the diff
read everything, so the unit of incremental cost is the bucket.

Usage: python tools/matview_probe.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.sources.catalog import (
    _bucket_expr,
    merge_into_versioned,
    read_versioned_table,
    write_versioned_table,
)
from amaxa_spark.sources import matview
from amaxa_spark.sources.matview import refresh_aggregate_versioned


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("matview_probe")
    import tempfile

    root = tempfile.mkdtemp(prefix="matview_probe_")
    src, view = os.path.join(root, "src"), os.path.join(root, "view")

    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("pk"),
            (F.col("id") % 2_000).alias("grp"),
            (F.col("id") % 97).cast("double").alias("amount"),
        )
    )
    write_versioned_table(df, src, pk="pk", n_buckets=n_buckets)

    t0 = time.time()
    refresh_aggregate_versioned(spark, src, view, "grp", ["amount"])
    t_build = time.time() - t0

    # narrow merge: keys confined to ~3 source buckets
    keys = (
        spark.range(n_rows)
        .select(F.col("id").alias("pk"))
        .withColumn("b", _bucket_expr("pk", n_buckets))
        .where(F.col("b") < 3)
        .limit(5_000)
        .select("pk")
    )
    upd = keys.select(
        "pk", (F.col("pk") % 2_000).alias("grp"), F.lit(999.0).alias("amount")
    )
    merge_into_versioned(spark, src, upd, pk="pk", set_cols=["grp", "amount"])

    t0 = time.time()
    refresh_aggregate_versioned(spark, src, view, "grp", ["amount"])
    t_incr = time.time() - t0

    # recompute floor: what a no-maintenance consumer pays per
    # refresh even before writing anything
    t0 = time.time()
    matview._full_aggregate(
        read_versioned_table(spark, src), "grp", ["amount"]
    ).count()
    t_floor = time.time() - t0

    print(
        f"rows={n_rows} buckets={n_buckets} "
        f"build={t_build:.2f}s incremental={t_incr:.2f}s "
        f"recompute_floor={t_floor:.2f}s "
        f"floor/incremental={t_floor / max(t_incr, 1e-9):.1f}x"
    )


if __name__ == "__main__":
    main()
