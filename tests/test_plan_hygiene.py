"""Repo-wide physical-plan hygiene: EVERY gate query's plan is built
at sf0.001 and linted for the two anti-patterns that silently kill a
100 TB run:

- ``CartesianProduct`` / unkeyed ``BroadcastNestedLoopJoin`` — an
  accidental cross product is O(n²) at scale. Joins of 1-row scalar
  aggregates (the scalar-subquery pattern) broadcast and are fine;
  real cartesian products are not.
- ``BatchEvalPython`` / ``PythonUDF`` outside Arrow — a row-at-a-time
  Python UDF caps throughput at ~10⁴ rows/s/core. The engine's only
  Python boundaries must be Arrow-batched
  (``ArrowEvalPython`` / ``FlatMapGroupsInPandas`` / ``MapInPandas``).

This is the executable form of the scale contract the docstrings
claim — a new query that sneaks in a cross join or a row UDF fails CI
here, not in production.
"""

import pytest

import __spark_entry__ as entry

QUERIES = entry.queries()

# 1-row-aggregate broadcasts render as BroadcastNestedLoopJoin with an
# IdentityBroadcastMode of a scalar aggregate — structurally a cross
# join of N×1, which is linear, not quadratic. Accept only that shape.
_SCALAR_BROADCAST_OK = "BroadcastExchange IdentityBroadcastMode"


@pytest.mark.parametrize("name", list(QUERIES))
def test_plan_hygiene(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # row-at-a-time Python is forbidden everywhere; Arrow batching is
    # the only legal Python boundary
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    # no true cartesian products
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if "BroadcastNestedLoopJoin" in plan:
        # every nested-loop join must be the scalar-aggregate
        # broadcast pattern (N×1), never table×table
        assert _SCALAR_BROADCAST_OK in plan, (
            f"{name}: nested-loop join without scalar broadcast"
        )
