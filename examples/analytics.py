"""Runnable analytics tour: SQL views over the engine catalog plus the
training-data operators, end to end on the sf0.01 test tables.

    python examples/analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amaxa_spark.session import get_spark
from amaxa_spark.sources.catalog import register_views
from amaxa_spark.tpch import TABLES, tpch_catalog


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("analytics_example", cpus=8)
    cat = tpch_catalog(spark, sf_dir)
    register_views(cat, [t for t in TABLES if t != "lineitem"])
    cat["lineitem"].createOrReplaceTempView("lineitem")

    print("\n-- plain SQL over the catalog: revenue by market segment --")
    spark.sql(
        """
        SELECT c_mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY revenue DESC
        """
    ).show()

    print("-- engine operators compose with SQL results --")
    from amaxa_spark.operators.dedup import fuzzy_pairs
    from amaxa_spark.operators.approx import distinct_with_bound_check

    pairs = fuzzy_pairs(
        cat["customer"], "c_custkey", "c_name",
        "substring({c}, 1, length({c}) - 2)", max_dist=1,
    )
    print(f"fuzzy name pairs (Levenshtein<=1, prefix-blocked): {pairs.count():,}")

    distinct_with_bound_check(cat["events"], "user_id", rsd=0.05).show()


if __name__ == "__main__":
    main()
