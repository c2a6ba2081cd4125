"""Streaming SCD2 interval maintenance via ``applyInPandasWithState``.

The incremental twin of ``operators.timeseries.scd2_intervals``: per
key the state is the OPEN interval — (current state value, its
valid_from) — and each arriving state change closes it (emitting the
finished interval) and opens a new one. Every update call also emits
the key's current open interval (``to_ms`` null), so a consumer
upserting on (key, from_ms) always holds the full SCD2 table: closed
rows are immutable once emitted, and the open row's ``to_ms``
transitions null → timestamp exactly once, when the next change
arrives.

With events arriving in event-time order the union of emitted closed
intervals plus the final open interval per key equals the batch
operator's output exactly (``test_streaming_scd2_matches_batch``).
Late events are the stated contract gap, as with the streaming
funnel: state only moves forward; batch replay reconciles.

Scale notes: state is one (string, long) pair per key — fixed-width,
bounded by key population, partitioned by the group key in the state
store. Each micro-batch sorts only its own per-key slice. Production
adds an event-time timeout for dormant keys; NoTimeout keeps the
equivalence testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def scd2_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Stateful streaming SCD2. Output rows: (key, state, from_ms,
    to_ms) — closed intervals plus the key's current open interval
    (to_ms null), upsert-keyed by (key, from_ms) in update mode."""
    out_schema = StructType(
        [
            StructField("key", LongType()),
            StructField("state", StringType()),
            StructField("from_ms", LongType()),
            StructField("to_ms", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("cur", StringType()), StructField("from_ms", LongType())]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        cur, from_ms = state.get if state.exists else (None, None)
        closed: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["__ts_ms", "__tb"], kind="mergesort")
            for ts_ms, val in zip(pdf["__ts_ms"], pdf["__state"]):
                if from_ms is None:
                    cur, from_ms = val, int(ts_ms)
                elif val != cur:  # change: close the open interval
                    closed.append((k, cur, from_ms, int(ts_ms)))
                    cur, from_ms = val, int(ts_ms)
        if from_ms is None:
            return  # no events ever (cannot happen in practice)
        state.update((cur, from_ms))
        closed.append((k, cur, from_ms, None))  # current open interval
        yield pd.DataFrame(
            closed, columns=["key", "state", "from_ms", "to_ms"]
        )

    return (
        events.select(
            F.col(key_col),
            F.col(state_col).cast("string").alias("__state"),
            F.unix_millis(F.col(ts_col)).alias("__ts_ms"),
            F.col(tiebreak_col).alias("__tb"),
        )
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
