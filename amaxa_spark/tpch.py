"""TPC-H-ish test-catalog wiring (TESTDATA.md tables).

Maps the driver's synthetic star schema onto the engine's metadata
model: FK edges `lineitem→(orders,part,supplier)`, `orders→customer`,
`customer/supplier→nation`, `nation→region` play the role of the
reference's lookup relationships (FIXTURES.md §mapping). ``lineitem``
has a composite natural key, so the catalog registers a derived
single-column PK view (``l_lineid``) — the engine's PK abstraction
stays single-column like the reference's ``Id``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from amaxa_spark.metadata import SchemaRegistry, TableMeta
from amaxa_spark.sources.catalog import TableCatalog

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def tpch_registry() -> SchemaRegistry:
    return SchemaRegistry(
        [
            TableMeta("region", pk="r_regionkey"),
            TableMeta("nation", pk="n_nationkey", lookups={"n_regionkey": ["region"]}),
            TableMeta(
                "customer", pk="c_custkey", lookups={"c_nationkey": ["nation"]}
            ),
            TableMeta(
                "supplier", pk="s_suppkey", lookups={"s_nationkey": ["nation"]}
            ),
            TableMeta("part", pk="p_partkey"),
            TableMeta("orders", pk="o_orderkey", lookups={"o_custkey": ["customer"]}),
            TableMeta(
                "lineitem",
                pk="l_lineid",
                lookups={
                    "l_orderkey": ["orders"],
                    "l_partkey": ["part"],
                    "l_suppkey": ["supplier"],
                },
            ),
            TableMeta("events", pk="event_id", lookups={}),
            TableMeta("documents", pk="doc_id"),
            TableMeta("embeddings", pk="vec_id"),
        ]
    )


def ensure_session_confs(spark: SparkSession) -> None:
    """Make a caller-provided session safe for this catalog: ns
    timestamps read as long (converted below), µs timestamps without a
    timezone annotation read as TIMESTAMP (not TIMESTAMP_NTZ, which
    unix_millis/unix_timestamp reject), and UTC semantics for time
    rendering. All are runtime-settable."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def tz_normalize(df):
    """Defensive NTZ→LTZ cast for DataFrames read before the session
    confs applied: under the UTC session timezone the naive wall-clock
    is reinterpreted as the identical UTC instant."""
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def tpch_catalog(spark: SparkSession, sf_dir: str) -> TableCatalog:
    ensure_session_confs(spark)
    cat = TableCatalog(spark, sf_dir, fmt="parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cat.register(
        "lineitem",
        li.withColumn(
            "l_lineid", F.col("l_orderkey") * F.lit(10) + F.col("l_linenumber")
        ),
    )
    # events.ts is parquet TIMESTAMP(NANOS) — read as int64 nanos
    # (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a real
    # timestamp at µs precision, matching engines that truncate ns→µs
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn(
            "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS BIGINT)"))
        )
    cat.register("events", tz_normalize(ev))
    return cat
