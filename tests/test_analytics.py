"""Plan-shape assertions for the batch-2 analytics queries
(subquery / outer-join / conditional-agg shapes, SURVEY §2.4's
"not present in the reference" list — beyond-parity coverage).

Correctness vs DuckDB is enforced by tools/check_correctness.py; these
tests pin the *physical plan* properties that matter at 100 TB: semi/
anti joins stay semi/anti (no row duplication), small sides broadcast,
and filters reach the parquet scan.
"""

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_is_semi_join_with_residual(spark, sf_dir):
    df = entry.q_exists_late_ship(spark, sf_dir)
    plan = _plan(df)
    # EXISTS must compile to a semi join (one output row per order, no
    # duplication from multi-lineitem matches) with the date residual
    assert "LeftSemi" in plan
    assert plan.count("Join") >= 1
    rows = {r["o_orderpriority"]: r["order_count"] for r in df.collect()}
    assert len(rows) == 5 and all(v > 0 for v in rows.values())


def test_cust_order_dist_preserves_zero_customers(spark, sf_dir):
    df = entry.q_cust_order_dist(spark, sf_dir)
    plan = _plan(df)
    assert "LeftOuter" in plan or "RightOuter" in plan
    dist = {r["c_count"]: r["custdist"] for r in df.collect()}
    # every customer appears exactly once in the distribution
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(dist.values()) == n_cust


def test_or_predicate_join_stays_hash_based(spark, sf_dir):
    df = entry.q_or_predicate_revenue(spark, sf_dir)
    plan = _plan(df)
    # the common p_partkey equi-key must be extracted: hash join, not
    # BroadcastNestedLoopJoin (which would be O(n*m) at scale)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_distinct_suppliers_not_in_is_anti_join(spark, sf_dir):
    df = entry.q_distinct_suppliers(spark, sf_dir)
    plan = _plan(df)
    assert "LeftAnti" in plan
    # both dims broadcast; lineitem must not shuffle before the joins
    assert plan.count("BroadcastHashJoin") >= 2


def test_top_supplier_scalar_max_broadcasts(spark, sf_dir):
    df = entry.q_top_supplier(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert len(rows) >= 1
    # decimal-exact max: every returned supplier carries the same revenue
    assert len({r["total_revenue"] for r in rows}) == 1


def test_promo_revenue_prunes_scan(spark, sf_dir):
    df = entry.q_promo_revenue(spark, sf_dir)
    plan = _plan(df)
    # the one-month window must reach the lineitem parquet scan
    assert "PushedFilters" in plan and "l_shipdate" in plan
    val = df.collect()[0]["promo_revenue"]
    assert 0.0 <= val <= 100.0


def test_small_qty_correlated_avg_decorrelates(spark, sf_dir):
    df = entry.q_small_qty_revenue(spark, sf_dir)
    plan = _plan(df)
    # hand-decorrelated: per-part aggregate joined back, brand dim broadcast
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan


def test_running_total_single_shuffle(spark, sf_dir):
    df = entry.q_events_running_total(spark, sf_dir)
    plan = _plan(df)
    # one exchange on event_type feeds the window sort; no second shuffle
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_sales_opportunity_anti_join_with_scalar_gate(spark, sf_dir):
    df = entry.q_sales_opportunity(spark, sf_dir)
    plan = _plan(df)
    # Q22 shape: NOT EXISTS stays an anti join; the AVG threshold is a
    # broadcast 1-row aggregate, never a per-row recompute
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["numcust"] > 0 for r in rows)


def test_scd2_intervals_collapse_runs_single_exchange(spark, sf_dir):
    from amaxa_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"),
            (2, 1, "x"),
        ],
        "k int, t int, s string",
    )
    out = scd2_intervals(df, "k", "t", "s", "t")
    # both windows and the run aggregation share ONE key exchange
    # (snapshot before execution — the post-AQE string renders the
    # materialized stage a second time)
    plan = _plan(out)
    assert plan.count("Exchange hashpartitioning") == 1
    rows = sorted(
        ((r["k"], r["s"], r["valid_from"], r["valid_to"]) for r in out.collect())
    )
    # consecutive identical states collapse; re-appearing 'a' is a NEW
    # interval (SCD2, not distinct states); current state open-ended
    assert rows == [
        (1, "a", 1, 3), (1, "a", 4, None), (1, "b", 3, 4),
        (2, "x", 1, None),
    ]
def test_fuzzy_pairs_blocked_linkage(spark, sf_dir):
    from amaxa_spark.operators.dedup import fuzzy_pairs

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pairs = fuzzy_pairs(
        cust, "c_custkey", "c_name",
        "substring({c}, 1, length({c}) - 2)", max_dist=1,
    )
    rows = pairs.collect()
    assert rows, "prefix blocks must yield distance-1 candidates"
    assert all(r["id_a"] < r["id_b"] and r["dist"] <= 1 for r in rows)
    # verify one pair really is edit-distance <= 1
    names = {r["c_custkey"]: r["c_name"] for r in cust.collect()}
    a, b = rows[0]["id_a"], rows[0]["id_b"]
    diff = sum(x != y for x, y in zip(names[a], names[b]))
    assert diff <= 1 and len(names[a]) == len(names[b])


def test_unpivot_roundtrips_pivot(spark, sf_dir):
    import __spark_entry__ as entry

    long = entry.q_unpivot_status(spark, sf_dir)
    wide = entry.q_pivot_status(spark, sf_dir)
    # every non-null wide cell appears exactly once in long form
    n_cells = sum(
        sum(r[c] is not None for c in ("open_total", "filled_total", "partial_total"))
        for r in wide.collect()
    )
    assert long.count() == n_cells
