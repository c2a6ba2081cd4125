"""Declarative data-quality constraint checks (operators/quality.py)."""

from pyspark.sql import functions as F

from amaxa_spark.operators.quality import Rule, check_constraints


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rules_evaluate_and_verdict(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, None, 30), (3, "xx!", 40)],
        "id int, lang string, n int",
    )
    rules = [
        Rule("id_complete", "id", "completeness", lo=1.0),
        Rule("id_unique", "id", "uniqueness", lo=1.0),
        Rule("n_min", "n", "min", lo=5.0),
        Rule("n_mean", "n", "mean", lo=0.0, hi=15.0),
        Rule("lang_iso2", "lang", "match_rate", pattern="^[a-z]{2}$", lo=0.9),
        Rule("lang_known", "lang", "in_set_rate", values=("en", "de"), lo=0.4),
    ]
    out = {r["rule"]: r for r in check_constraints(df, rules).collect()}
    assert out["id_complete"]["value"] == 1.0 and out["id_complete"]["passed"]
    # 3 distinct of 4 rows -> uniqueness violated
    assert out["id_unique"]["value"] == 0.75 and not out["id_unique"]["passed"]
    assert out["n_min"]["value"] == 10.0 and out["n_min"]["passed"]
    # mean 25 > hi bound 15
    assert out["n_mean"]["value"] == 25.0 and not out["n_mean"]["passed"]
    # 2 of 4 rows match (null and 'xx!' fail)
    assert out["lang_iso2"]["value"] == 0.5 and not out["lang_iso2"]["passed"]
    assert out["lang_known"]["value"] == 0.5 and out["lang_known"]["passed"]


def test_single_pass_plan(spark):
    """All rules share one aggregation over one scan — the 100 TB
    contract: adding a rule must not add a pass over the data."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("en").alias("lang")
    )
    rules = [
        Rule("c", "id", "completeness", lo=1.0),
        Rule("m", "k", "mean"),
        Rule("mx", "k", "max", hi=10.0),
        Rule("r", "lang", "match_rate", pattern="^[a-z]+$", lo=1.0),
    ]
    plan = _plan(check_constraints(df, rules))
    assert plan.count("Range") == 1  # one scan of the source
    # no distinct rule here -> plain partial+final hash aggregate
    assert "Expand" not in plan


def test_unbounded_rule_always_passes(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    out = check_constraints(df, [Rule("stat_only", "v", "mean")]).collect()
    assert out[0]["passed"] and out[0]["value"] == 1.5


def test_grouped_rules_verdict_per_group(spark):
    from amaxa_spark.operators.quality import Rule, check_constraints_by

    df = spark.createDataFrame(
        [("en", 10), ("en", 20), ("de", 1), ("de", 2)], "lang string, n int"
    )
    out = {(r["group"], r["rule"]): r for r in
           check_constraints_by(
               df, [Rule("n_min", "n", "min", lo=5.0)], "lang"
           ).collect()}
    # the SAME rule passes for one group and fails for the other —
    # the segmentation a global check can't express
    assert out[("en", "n_min")]["passed"] and out[("en", "n_min")]["value"] == 10.0
    assert not out[("de", "n_min")]["passed"]
    # one grouped aggregation pass, one scan
    plan = (
        check_constraints_by(df, [Rule("a", "n", "min"), Rule("b", "n", "mean")], "lang")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1
