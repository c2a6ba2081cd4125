"""Declarative data-quality constraint checking (the Deequ shape).

A user states WHAT must hold — completeness, uniqueness, value bounds,
pattern-match rates, set membership — and the engine compiles every
rule into conditional aggregates evaluated in ONE pass over the table,
then unpivots the single metrics row into one (rule, value, passed)
row per constraint. This is the validation half of the reference's
input-validation story (`/root/reference/amaxa/loader/
load_operation.py:151-208` checks column *presence*; these rules check
column *content*) generalized to the corpus-audit checks a 100 TB
ingest actually runs before training.

Scale shape: all rules share ONE hash-aggregation over a single scan —
map-side partial aggregation, a 1-row result, then a driver-free
``stack`` unpivot of that row. Distinct-count rules add Spark's
Expand-based distinct aggregation (still one shuffle); at extreme
cardinality swap ``uniqueness`` for the sketch-backed
``approx.approx_distinct`` contract instead. No Python, no collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint.

    check ∈ {completeness, uniqueness, min, max, mean, match_rate,
    in_set_rate}; ``lo``/``hi`` bound the metric for the pass verdict
    (either side may be None = unbounded). ``pattern`` feeds
    match_rate (rlike), ``values`` feeds in_set_rate; nulls count as
    non-matching for both rates.
    """

    name: str
    column: str
    check: str
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple | None = None


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Rule-free column profiling — the describe-table sweep that
    seeds rule writing: one row per column with row count, null
    count/ratio, and distinct count/ratio. Run it first, write
    :func:`check_constraints` rules from what it shows.

    Scale shape: every column's metrics come from ONE aggregation
    pass over one scan (null counts are conditional sums; distinct
    counts share the Expand-based distinct aggregation), then a
    driver-free stack unpivot — profiling more columns never adds a
    pass.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd{i}"))
    m = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        cq = c.replace("'", "''")
        parts.append(f"'{cq}', __nn{i}, __nd{i}")
    stacked = m.select(
        F.col("__n"),
        F.expr(
            f"stack({len(cols)}, " + ", ".join(parts)
            + ") as (column, n_nulls, n_distinct)"
        ),
    )
    return stacked.select(
        "column",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("__n"), 6).alias("null_ratio"),
        "n_distinct",
        F.round(F.col("n_distinct") / F.col("__n"), 6).alias("distinct_ratio"),
    )


def _metric(rule: Rule) -> F.Column:
    c = F.col(rule.column)
    n = F.count(F.lit(1))
    if rule.check == "completeness":
        return F.count(c) / n
    if rule.check == "uniqueness":
        return F.countDistinct(c) / n
    if rule.check == "min":
        return F.min(c).cast("double")
    if rule.check == "max":
        return F.max(c).cast("double")
    if rule.check == "mean":
        return F.avg(c)
    if rule.check == "match_rate":
        hit = F.when(c.cast("string").rlike(rule.pattern), 1.0).otherwise(0.0)
        return F.sum(hit) / n
    if rule.check == "in_set_rate":
        hit = F.when(c.isin(*rule.values), 1.0).otherwise(0.0)
        return F.sum(hit) / n
    raise ValueError(f"unknown check {rule.check!r}")


def check_constraints_by(
    df: DataFrame, rules: list[Rule], by: str
) -> DataFrame:
    """Per-group constraint evaluation: every rule checked within
    each ``by`` group (per-language length floors, per-source
    match rates…) — the segmented audit that a global average hides
    (one rotten source inside a healthy corpus-wide mean).

    Same one-pass contract as :func:`check_constraints`, now grouped:
    ONE hash aggregation keyed on ``by`` computes every rule's metric
    for every group (map-side combined; output is |groups|×|rules|),
    then the stack unpivot and threshold projection run per group
    row. Returns (group, rule, column, check, value, passed).
    """
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    metrics = df.groupBy(F.col(by).alias("group")).agg(
        *[F.round(_metric(r), 6).alias(f"__m{i}") for i, r in enumerate(rules)]
    )

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    stack_args = [
        f"{q(r.name)}, {q(r.column)}, {q(r.check)}, __m{i}"
        for i, r in enumerate(rules)
    ]
    stacked = metrics.select(
        "group",
        F.expr(
            f"stack({len(rules)}, " + ", ".join(stack_args)
            + ") as (rule, column, check, value)"
        ),
    )
    passed = F.lit(True)
    for r in rules:
        ok = F.lit(True)
        if r.lo is not None:
            ok = ok & (F.col("value") >= F.lit(float(r.lo)))
        if r.hi is not None:
            ok = ok & (F.col("value") <= F.lit(float(r.hi)))
        passed = F.when(F.col("rule") == r.name, ok).otherwise(passed)
    return stacked.select(
        "group", "rule", "column", "check", "value", passed.alias("passed")
    )


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregation pass.

    Returns one row per rule: (rule, column, check, value, passed)
    with ``value`` rounded to 6 decimals and ``passed`` the
    lo ≤ value ≤ hi verdict (unbounded sides always hold).
    """
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        # the verdict projection keys on the rule name — duplicates
        # would silently apply one rule's bounds to another's metric
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    metrics = df.agg(
        *[F.round(_metric(r), 6).alias(f"__m{i}") for i, r in enumerate(rules)]
    )

    def q(s: str) -> str:
        # SQL string literal (quotes doubled) — rule/column names come
        # from user YAML and must not break the stack() expression
        return "'" + s.replace("'", "''") + "'"

    # stack the 1-row metrics frame into one row per rule; thresholds
    # are literals, so the verdict is a pure projection
    stack_args = []
    for i, r in enumerate(rules):
        stack_args.append(f"{q(r.name)}, {q(r.column)}, {q(r.check)}, __m{i}")
    stacked = metrics.select(
        F.expr(
            f"stack({len(rules)}, "
            + ", ".join(stack_args)
            + ") as (rule, column, check, value)"
        )
    )
    passed = F.lit(True)
    for r in rules:
        ok = F.lit(True)
        if r.lo is not None:
            ok = ok & (F.col("value") >= F.lit(float(r.lo)))
        if r.hi is not None:
            ok = ok & (F.col("value") <= F.lit(float(r.hi)))
        passed = F.when(F.col("rule") == r.name, ok).otherwise(passed)
    return stacked.select(
        "rule", "column", "check", "value", passed.alias("passed")
    )
