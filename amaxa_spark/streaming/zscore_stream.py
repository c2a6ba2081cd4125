"""Streaming rolling z-score anomalies via ``applyInPandasWithState``.

The incremental twin of ``operators.timeseries.rolling_zscore``: per
key the state is a fixed-width ring of the last ``nrows`` values; each
arriving observation is scored against the ring BEFORE being pushed
into it (the strictly-prior frame of the batch operator), emitting one
flagged row per event. Under in-order arrival the emitted rows equal
the batch operator's output exactly
(``test_streaming_zscore_matches_batch``); late events score against
whatever history has been seen — the forward-only contract shared by
the streaming funnel and SCD2 twins, with batch replay as the
reconciliation path.

Scale notes: state is ``nrows`` doubles + a cursor per key —
fixed-width regardless of stream length, partitioned by the group key
in the state store. Mean/std are computed per event over ≤ ``nrows``
values in numpy inside the Arrow batch. NoTimeout keeps equivalence
testable; production adds an event-time timeout for dormant keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def zscore_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    nrows: int = 5,
    z: float = 2.0,
) -> DataFrame:
    """Stateful streaming z-score. Output one row per event:
    (key, ts_ms, tiebreak, value, trail_mean, trail_std, is_anomaly)
    with the same rounding and guards as the batch operator."""
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("ts_ms", LongType()),
            StructField("tiebreak", LongType()),
            StructField("value", DoubleType()),
            StructField("trail_mean", DoubleType()),
            StructField("trail_std", DoubleType()),
            StructField("is_anomaly", IntegerType()),
        ]
    )
    # ring of the last nrows values (oldest-first count semantics via
    # n_seen: ring slot (n_seen % nrows) is overwritten next)
    state_schema = StructType(
        [StructField("n_seen", LongType())]
        + [StructField(f"v{i}", DoubleType()) for i in range(nrows)]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            st = state.get
            n_seen, ring = int(st[0]), list(st[1:])
        else:
            n_seen, ring = 0, [None] * nrows
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["__ts_ms", "__tb"], kind="mergesort")
            for ts_ms, tb, v in zip(pdf["__ts_ms"], pdf["__tb"], pdf["__v"]):
                hist = [x for x in ring if x is not None]
                if len(hist) >= 2:
                    m = sum(hist) / len(hist)
                    var = sum((x - m) ** 2 for x in hist) / (len(hist) - 1)
                    s = math.sqrt(var)
                    flag = 1 if s > 0 and abs(v - m) > z * s else 0
                    m_r, s_r = round(m, 6), round(s, 6)
                elif len(hist) == 1:
                    m_r, s_r, flag = round(hist[0], 6), None, 0
                else:
                    m_r, s_r, flag = None, None, 0
                out.append(
                    (k, int(ts_ms), int(tb), float(v), m_r, s_r, flag)
                )
                ring[n_seen % nrows] = float(v)
                n_seen += 1
        state.update((n_seen, *ring))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "ts_ms", "tiebreak", "value",
                    "trail_mean", "trail_std", "is_anomaly",
                ],
            )

    return (
        events.select(
            F.col(key_col),
            F.unix_millis(F.col(ts_col)).alias("__ts_ms"),
            F.col(tiebreak_col).alias("__tb"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
