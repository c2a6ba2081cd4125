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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
) -> DataFrame:
    """Range (interval) join: pair each left row with every right row
    of the same key whose timestamp lies in
    ``[left_ts + lower_ms, left_ts + upper_ms]``.

    A naive theta-join on the inequality is a per-key cross product.
    Banding fixes that at scale: both sides are assigned to time bands
    of width ``upper_ms - lower_ms`` (left rows explode to the ≤2
    bands their window can overlap), the join runs on the narrow
    ``(key, band)`` equi-key — which Catalyst executes as a plain
    hash join — and the exact inequality filters band-collisions
    afterward. Join fan-out tracks true temporal co-occurrence, never
    |left|x|right| per key.

    Returns left columns + right columns suffixed ``_r`` (inner join
    semantics: unmatched left rows are absent).
    """
    width = int(upper_ms - lower_ms)
    if width <= 0:
        raise ValueError("upper_ms must exceed lower_ms")
    lt = F.unix_millis(F.col(left_ts))
    rt = F.unix_millis(F.col(right_ts))
    l_banded = left.select(
        *left.columns,
        lt.alias("__lt"),
        F.explode(
            F.sequence(
                F.floor((lt + F.lit(lower_ms)) / width).cast("long"),
                F.floor((lt + F.lit(upper_ms)) / width).cast("long"),
            )
        ).alias("__bl"),
    )
    r_banded = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns],
        rt.alias("__rt"),
        F.floor(rt / width).cast("long").alias("__br"),
    )
    joined = l_banded.join(
        r_banded,
        (F.col("__bl") == F.col("__br")) & (F.col(by) == F.col(f"{by}_r")),
        "inner",
    )
    exact = joined.where(
        (F.col("__rt") >= F.col("__lt") + F.lit(lower_ms))
        & (F.col("__rt") <= F.col("__lt") + F.lit(upper_ms))
    )
    return exact.select(
        *left.columns, *[f"{c}_r" for c in right.columns]
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts: str,
    by: str,
    value_cols: list[str],
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: left rows keep all their columns and gain
    ``<col><suffix>`` for each right ``value_cols`` entry.

    ``direction="backward"`` (default) attaches the most recent right
    row with ``right.ts <= left.ts``; ``"forward"`` the next upcoming
    right row with ``right.ts >= left.ts`` (the "next maintenance
    after the failure" query). Ties are included in both directions;
    null when no qualifying right row exists. Same single-shuffle
    union+window shape either way — only the tag ordering and the
    window frame flip.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    fwd = direction == "forward"
    side_r = 0
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
        F.lit(side_r).alias("__side"),
        *[F.col(c).alias(t) for c, t in zip(value_cols, taken)],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # BOTH directions use the O(n) running-last over an
    # unbounded-PRECEDING frame (Spark executes unbounded-FOLLOWING
    # frames by rescanning to the partition end per row — O(n²) on a
    # hot key). Forward simply sorts time DESCENDING: rights at or
    # after the left row then precede it, and the running last is
    # the EARLIEST such right. Right rows sort before left at equal
    # ts in both orders (side 0 < 1 asc; ties on ts keep side asc),
    # so ties stay included.
    order = F.col(ts).desc() if fwd else F.col(ts).asc()
    w = (
        Window.partitionBy(by)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "__side",
        *[
            F.last(F.col(t), ignorenulls=True).over(w).alias(t)
            for t in taken
        ],
    )
    return filled.where(F.col("__side") == 1).drop("__side")
