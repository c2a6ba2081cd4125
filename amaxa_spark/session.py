"""SparkSession factory tuned for this engine.

Local-mode defaults match the test environment (local[32], single JVM)
but every setting is chosen to also be correct on a multi-executor
cluster: AQE on (runtime join re-planning, skew handling, partition
coalescing), UTC session timezone (oracle comparability), Arrow enabled
for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "amaxa_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the driver's events table stores TIMESTAMP(NANOS); read the
        # raw int64 and convert explicitly (timestamp_micros) instead
        # of failing the scan
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # parquet timestamps without a timezone annotation read as
        # TIMESTAMP (LTZ, classic behavior) rather than TIMESTAMP_NTZ,
        # so unix_millis/unix_timestamp work and values line up with
        # the DuckDB oracle's naive timestamps under the UTC session tz
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("AMAXA_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
