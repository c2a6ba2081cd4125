"""Streaming funnel progression via ``applyInPandasWithState``.

The incremental twin of ``operators.timeseries.funnel``: per-user
funnel state (one epoch-ms timestamp per step, null past the
drop-off) advances as events arrive, emitting the user's current
progression each time it changes. Step i+1 credits only strictly
after the stored step-i timestamp — the same strict-order contract
as the batch operator, so with events arriving in event-time order
(the watermarked-ingest case) the final emitted state per user equals
the batch funnel's row exactly (``test_streaming_funnel_matches_batch``).

Contract difference vs batch, stated rather than hidden: a LATE event
(earlier ``ts`` than already-processed ones) cannot retroactively
improve a step already credited — state only moves forward. Batch
replay over the full log is the reconciliation path, exactly as with
any streaming/batch lambda pair.

Scale notes: state is k timestamps per user — fixed-width, bounded by
the user population, partitioned by the group key in the state store.
Each micro-batch sorts only its own per-user slice by event time.
Production would add an event-time timeout to expire dormant users;
kept NoTimeout here to keep the final-state equivalence testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Stateful streaming funnel. Output rows: (user, steps_completed,
    t1_ms..tk_ms), one per user per micro-batch in which that user had
    events (update mode)."""
    k = len(steps)
    if len(set(steps)) != k:
        raise ValueError("funnel steps must be distinct")
    step_idx = {s: i for i, s in enumerate(steps)}

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("steps_completed", LongType()),
            *[StructField(f"t{i}_ms", LongType()) for i in range(1, k + 1)],
        ]
    )
    state_schema = StructType(
        [StructField(f"t{i}", LongType()) for i in range(1, k + 1)]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_list = list(state.get) if state.exists else [None] * k
        for pdf in pdfs:
            pdf = pdf.sort_values("__ts_ms", kind="mergesort")
            for ts_ms, typ in zip(pdf["__ts_ms"], pdf[type_col]):
                i = step_idx.get(typ)
                if i is None or ts_list[i] is not None:
                    continue
                if i == 0 or (
                    ts_list[i - 1] is not None and ts_ms > ts_list[i - 1]
                ):
                    ts_list[i] = int(ts_ms)
        state.update(tuple(ts_list))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "steps_completed": [sum(t is not None for t in ts_list)],
                **{f"t{i+1}_ms": [ts_list[i]] for i in range(k)},
            }
        )

    return (
        events.select(
            F.col(user_col),
            F.col(type_col),
            F.unix_millis(F.col(ts_col)).alias("__ts_ms"),
        )
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
