"""sf1-scale bench point: synthesize 10x-sf0.1 tables in /tmp and time
the most expensive bench queries against them.

The driver's testdata stops at sf0.1 (read-only); this generator
produces sf1-SHAPED tables (same schemas, same text/vocab statistics,
~10x rows: lineitem 6M, customer 150k, documents 50k with ~2% planted
near-dups, embeddings 20k x 64) so constant factors that hide at
sf0.1 surface. Deterministic (hash-driven, no RNG), built once and
cached under /tmp/amaxa_sf1.

Usage: python tools/sf1_bench.py [--rebuild] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from amaxa_spark.session import get_spark

OUT = "/tmp/amaxa_sf1"

# the round-4 bench's most expensive queries (the sf1 watch-list),
# plus their same-table family members
DEFAULT_QUERIES = [
    "weighted_linkage", "fuzzy_pairs",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_clusters",
    "dedup_kept", "group_split", "split_leakage",
    "dedup_representatives", "dedup_simhash", "contamination",
    "corr_matrix", "ann_ivf_topk", "ann_ivf_topk_pandas",
    "dedup_embedding_cosine_lsh", "knn_join_lsh", "key_gini",
]

VOCAB = [
    "spark", "query", "table", "column", "line", "part", "scan",
    "sort", "hash", "value", "order", "batch", "agg", "fast", "slow",
    "small", "large", "vector", "index", "join", "merge", "shuffle",
    "cache", "disk", "rowset", "plan", "cost", "stats", "a", "the",
    "page",
]


def _word(expr):
    """Deterministic vocab pick from a bigint hash expression."""
    arr = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(arr, (F.pmod(expr, F.lit(len(VOCAB))) + 1).cast("int"))


def build(spark) -> None:
    os.makedirs(OUT, exist_ok=True)

    # customer: 150k, TPC-H name format (fixed-width digit suffix)
    cust = spark.range(0, 150_000).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
        F.round((F.xxhash64("id", F.lit("bal")) % 1_000_000) / 100.0, 2).alias(
            "c_acctbal"
        ),
        F.element_at(
            F.array(*[F.lit(s) for s in
                      ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
            (F.pmod(F.xxhash64("id", F.lit("seg")), F.lit(5)) + 1).cast("int"),
        ).alias("c_mktsegment"),
    )
    cust.write.mode("overwrite").parquet(f"{OUT}/customer.parquet")

    # lineitem: 6M, numerics with mild cross-correlation (corr_matrix)
    li = spark.range(0, 6_000_000).select(
        "id",
        (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit("p")), F.lit(200_000)).alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit("s")), F.lit(10_000)).alias("l_suppkey"),
        (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64("id", F.lit("q")), F.lit(50)) + 1).cast("double").alias(
            "l_quantity"
        ),
    ).withColumn(
        "l_extendedprice",
        F.round(F.col("l_quantity") * (900 + F.pmod(F.xxhash64("id", F.lit("pr")), F.lit(200))), 2),
    ).withColumn(
        "l_discount",
        F.round(F.pmod(F.xxhash64("id", F.lit("d")), F.lit(11)) / 100.0, 2),
    ).withColumn(
        "l_tax",
        F.round(F.pmod(F.xxhash64("id", F.lit("t")), F.lit(9)) / 100.0, 2),
    ).withColumn(
        "l_returnflag",
        F.element_at(F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                     (F.pmod(F.xxhash64("id", F.lit("rf")), F.lit(3)) + 1).cast("int")),
    ).withColumn(
        "l_linestatus",
        F.element_at(F.array(F.lit("F"), F.lit("O")),
                     (F.pmod(F.xxhash64("id", F.lit("ls")), F.lit(2)) + 1).cast("int")),
    ).withColumn(
        "l_shipdate",
        F.timestamp_seconds(F.lit(694224000) + F.pmod(F.xxhash64("id", F.lit("sd")), F.lit(220752000))),
    ).drop("id")
    li.write.mode("overwrite").parquet(f"{OUT}/lineitem.parquet")

    # documents: 50k, ~50 words each from the 31-word vocab (matches
    # the testdata's text statistics); every 50th doc is a near-dup of
    # its predecessor (one word swapped) so the cluster pipeline has
    # real work
    base = spark.range(0, 50_000).select(F.col("id").alias("doc_id"))
    src = F.when(
        F.col("doc_id") % 50 == 1, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(50)),
        lambda i: _word(F.xxhash64(src, i, F.lit("w"))),
    )
    # the near-dup swaps word 25 only
    words = F.transform(
        words,
        lambda w, i: F.when(
            (F.col("doc_id") % 50 == 1) & (i == 24),
            _word(F.xxhash64(F.col("doc_id"), F.lit("swap"))),
        ).otherwise(w),
    )
    docs = base.select(
        "doc_id",
        F.concat_ws(" ", words).alias("text"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "es", "zh")]),
            (F.pmod(F.xxhash64("doc_id", F.lit("lang")), F.lit(5)) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64("doc_id", F.lit("srcn")), F.lit(20))).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    docs.write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # embeddings: 20k x 64-dim floats in [0, 1), 10 labels
    emb = spark.range(0, 20_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (F.pmod(F.xxhash64("id", i, F.lit("e")), F.lit(10_000)) / 10_000.0).cast("float"),
        ).alias("embedding"),
        F.pmod(F.xxhash64("id", F.lit("lab")), F.lit(10)).cast("int").alias("label"),
    )
    emb.write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    # orders: 1.5M (l_orderkey in lineitem spans 0..1.5M)
    orders = spark.range(0, 1_500_000).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id", F.lit("c")), F.lit(150_000)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            (F.pmod(F.xxhash64("id", F.lit("st")), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        F.round(
            1000 + F.pmod(F.xxhash64("id", F.lit("tp")), F.lit(40_000_000)) / 100.0, 2
        ).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(694224000) + F.pmod(F.xxhash64("id", F.lit("od")), F.lit(220752000))
        ).alias("o_orderdate"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")]),
            (F.pmod(F.xxhash64("id", F.lit("pr2")), F.lit(5)) + 1).cast("int"),
        ).alias("o_orderpriority"),
    )
    orders.write.mode("overwrite").parquet(f"{OUT}/orders.parquet")

    # supplier: 10k (l_suppkey range), part: 200k (l_partkey range)
    supplier = spark.range(0, 10_000).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", F.col("id")).alias("s_name"),
        (F.col("id") % 25).cast("int").alias("s_nationkey"),
        F.round(F.pmod(F.xxhash64("id", F.lit("sb")), F.lit(1_000_000)) / 100.0, 2).alias("s_acctbal"),
    )
    supplier.write.mode("overwrite").parquet(f"{OUT}/supplier.parquet")
    adjs = ("blue", "cold", "hot", "large", "new", "red", "small", "old")
    nouns = ("anvil", "bolt", "ring", "rod", "widget", "gear", "plate", "cog")
    part = spark.range(0, 200_000).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(
            " ",
            F.element_at(F.array(*[F.lit(a) for a in adjs]),
                         (F.pmod(F.xxhash64("id", F.lit("pa")), F.lit(8)) + 1).cast("int")),
            F.element_at(F.array(*[F.lit(n) for n in nouns]),
                         (F.pmod(F.xxhash64("id", F.lit("pn")), F.lit(8)) + 1).cast("int")),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), F.pmod(F.xxhash64("id", F.lit("pb")), F.lit(25))).alias("p_brand"),
        F.element_at(
            F.array(*[F.lit(x) for x in
                      ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")]),
            (F.pmod(F.xxhash64("id", F.lit("pt")), F.lit(6)) + 1).cast("int"),
        ).alias("p_type"),
        (F.pmod(F.xxhash64("id", F.lit("ps")), F.lit(50)) + 1).cast("int").alias("p_size"),
        F.round(900 + F.pmod(F.xxhash64("id", F.lit("pp")), F.lit(20_000)) / 100.0, 2).alias("p_retailprice"),
    )
    part.write.mode("overwrite").parquet(f"{OUT}/part.parquet")

    nation = spark.range(0, 25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.format_string("NATION_%d", F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    nation.write.mode("overwrite").parquet(f"{OUT}/nation.parquet")
    region = spark.createDataFrame(
        list(enumerate(("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))),
        "r_regionkey int, r_name string",
    )
    region.write.mode("overwrite").parquet(f"{OUT}/region.parquet")

    # events: 1M rows for key_gini and friends
    ev = spark.range(0, 1_000_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1577836800) + F.pmod(F.xxhash64("id", F.lit("ts")), F.lit(31_536_000))).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(100_000)).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("view", "click", "cart", "purchase")]),
            (F.pmod(F.xxhash64("id", F.lit("et")), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
        F.round(F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)) / 100.0, 2).alias("value"),
        F.lit('{"k":1}').alias("props"),
    )
    ev.write.mode("overwrite").parquet(f"{OUT}/events.parquet")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rebuild = "--rebuild" in args
    names = [a for a in args if not a.startswith("--")] or DEFAULT_QUERIES
    spark = get_spark("sf1_bench")
    if rebuild or not os.path.exists(f"{OUT}/documents.parquet"):
        t0 = time.time()
        build(spark)
        print(f"built sf1 tables in {time.time() - t0:.1f}s -> {OUT}")
    queries = entrymod.queries()
    total = 0.0
    for name in names:
        t0 = time.time()
        queries[name](spark, OUT).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        total += dt
        print(f"{name:32s} {dt:8.2f}s")
    print(f"{'TOTAL':32s} {total:8.2f}s")


if __name__ == "__main__":
    main()
