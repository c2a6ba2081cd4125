"""A runnable tour of the versioned-storage (lakehouse) surface:

    python examples/lakehouse_tour.py

Covers, end to end on a toy table: init with skipping + constraints,
MERGE / UPDATE / DELETE, metadata-only ALTER (add + drop), OPTIMIZE
with range-split clustering, data-skipping reads (stats + bloom +
file tiers), time travel, RESTORE, SHALLOW CLONE, change-data-feed,
the live external DuckDB scan, and vacuum. Everything here is also
reachable from the CLI (`python -m amaxa_spark table --help`,
`... sql PATH`)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark.session import get_spark
from amaxa_spark.sources import catalog as C


def main() -> None:
    spark = get_spark("lakehouse-tour", cpus=4)
    root = os.path.join(tempfile.mkdtemp(prefix="tour-"), "orders")

    # ---- init: pk-hash buckets + skipping stats + a CHECK constraint
    df = spark.range(1000).select(
        F.col("id").alias("order_id"),
        (F.col("id") % 7).alias("region"),
        (F.col("id") * 1.5).alias("amount"),
        F.concat(F.lit("cust"), F.col("id") % 100).alias("customer"),
    )
    C.write_versioned_table(
        df, root, "order_id", n_buckets=16,
        stats_cols=["amount"], bloom_cols=["customer"],
        file_stats=True,
        constraints={"amount_nonneg": "amount >= 0"},
    )
    t0 = C._bucket_manifest(root)["token"]
    print(f"init: {C.read_versioned_table(spark, root).count()} rows @ {t0}")

    # ---- DML: MERGE upsert, UPDATE, DELETE — each one atomic commit
    C.merge_into_versioned(
        spark, root,
        spark.createDataFrame([(2000, 3, 9.0, "cust1")],
                              "order_id long, region long, amount double, "
                              "customer string"),
        "order_id", ["region", "amount", "customer"], not_matched="insert",
    )
    C.update_versioned(
        spark, root, {"amount": "amount * 1.1"},
        prune=[("amount", 1000.0, None)],  # also DRIVES bucket skipping
    )
    C.delete_from_versioned(
        spark, root, spark.createDataFrame([(13,)], "order_id long"),
        "order_id",
    )
    # merge-on-read twin: a DELETION VECTOR writes kilobytes of pk
    # sidecar instead of rewriting buckets; reads anti-join, the next
    # rewrite (or OPTIMIZE) materializes it
    C.delete_from_versioned(
        spark, root, spark.createDataFrame([(14,)], "order_id long"),
        "order_id", mode="dv",
    )
    print("dv buckets:", sorted(C._bucket_manifest(root).get("dv", {})))

    # ---- a violating write refuses atomically
    try:
        C.update_versioned(spark, root, {"amount": F.lit(-5.0)},
                           where="region = 2")
    except C.ConstraintViolationError as e:
        print(f"constraint held: {str(e)[:80]}...")

    # ---- metadata-only schema evolution, both directions
    C.alter_versioned_add_columns(
        root, {"status": ("string", "open")}, spark=spark
    )
    C.alter_versioned_drop_columns(root, ["region"], spark=spark)
    # RENAME via column mapping: parquet keeps the original physical
    # name forever; this is one manifest commit at any table size
    C.alter_versioned_rename_column(root, "status", "state", spark)
    print("columns now:", C.read_versioned_table(spark, root).columns)

    # ---- OPTIMIZE: range-split clustering makes the file tier selective
    C.optimize_versioned(
        spark, root, cluster_by=["amount"], files_per_bucket=4
    )
    pruned = C.read_versioned_table(
        spark, root, prune=[("amount", 100.0, 120.0)]
    )
    print("range read after clustering:", pruned.count(), "rows")
    point = C.read_versioned_table(spark, root, eq=[("customer", "cust42")])
    print("bloom point lookup:", point.count(), "rows")

    # ---- time travel, RESTORE, CLONE
    print("rows @ t0 (time travel):",
          C.read_versioned_table(spark, root, token=t0).count())
    C.restore_versioned(root, t0)
    print("rows after RESTORE:", C.read_versioned_table(spark, root).count())
    clone = os.path.join(os.path.dirname(root), "orders-dev")
    C.clone_versioned(root, clone)
    C.update_versioned(spark, clone, {"amount": F.lit(0.0)})
    print("clone diverged; source untouched:",
          C.read_versioned_table(spark, root)
          .agg(F.max("amount")).first()[0])

    # ---- change data feed between any two retained snapshots
    head = C._bucket_manifest(root)["token"]
    feed = C.diff_versioned(spark, root, t0, head)
    print("CDF t0->head:", feed.groupBy("_change_type").count().collect())

    # ---- live external scan: DuckDB follows the commit chain, no export
    import duckdb

    sql = C.manifest_to_sql(root)
    print("DuckDB live scan:", duckdb.sql(
        f"SELECT count(*) FROM ({sql})"
    ).fetchone()[0], "rows")

    # ---- history + vacuum
    for row in C.history_versioned(root)[-3:]:
        print("history:", {k: row[k] for k in ("seq", "token")})
    removed = C.vacuum_versioned(root, keep_last=3)
    print(f"vacuum reclaimed {len(removed)} generation dir(s)")


if __name__ == "__main__":
    main()
