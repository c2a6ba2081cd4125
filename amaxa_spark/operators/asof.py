"""As-of (point-in-time) join — an operator Spark's DataFrame API
lacks natively, composed here from a union + window rather than a
Pandas UDF.

For each left row, attach the most recent right row with the same key
and ``right.ts <= left.ts`` (backward as-of, tie included — the same
semantics as DuckDB's ``ASOF JOIN`` and pandas ``merge_asof``).

Implementation (the "union trick"): tag both inputs, union them, and
take ``last(right col, ignoreNulls)`` over a window partitioned by
key and ordered by (ts, side) — right rows sort before left rows at
equal timestamps, so ties resolve to "included". This is ONE shuffle
(the window's partitioning) over left+right combined, versus a
range-join's quadratic blowup or a per-key ``merge_asof`` in Python.
At 100 TB the window sort is the cost: it partitions by the join key,
so skewed keys behave exactly like any skewed aggregation (salt or
AQE-skew handles them), and each partition sorts locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: left rows keep all their columns and gain
    ``<col><suffix>`` for each right ``value_cols`` entry (null when
    no earlier right row exists for the key)."""
    taken = [f"{c}{suffix}" for c in value_cols]
    l_tagged = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(t)
            for c, t in zip(value_cols, taken)
        ],
    )
    r_tagged = right.select(
        *[
            F.col(c)
            if c in (by, ts)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(t) for c, t in zip(value_cols, taken)],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "__side",
        *[F.last(F.col(t), ignorenulls=True).over(w).alias(t) for t in taken],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
