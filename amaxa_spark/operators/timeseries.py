"""Time-series rollups — the hypertable-style bucket aggregation with
gap filling.

``time_bucket_rollup`` is the batch form of a continuous aggregate:
tumbling-bucket aggregation per series key, with empty buckets
materialized (zero-filled) so downstream consumers see a dense,
regular series. Gap filling is the part plain ``groupBy`` can't do —
missing buckets produce no rows at all — and is built here from each
series' [min, max] bucket span via ``sequence`` + ``explode``.

Scale shape: the rollup is one hash aggregation (map-side combined);
the spine is one tiny per-key aggregate (min/max) exploded to bucket
rows — its volume is (#keys × span/width), i.e. the OUTPUT size, not
the input size — then a left join fills observed buckets in. No
window functions, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket_rollup(
    df: DataFrame,
    ts: str,
    key: str,
    value: str,
    width_s: int = 3600,
    fill: bool = True,
) -> DataFrame:
    """Per-(key, bucket) count and sum with optional gap fill.

    Buckets are epoch-second multiples of ``width_s``. With
    ``fill=True`` every key gets one row for EVERY bucket between its
    first and last observation, zero-filled where no events landed.
    Returns (key, bucket_start, n, total) — ``total`` rounded to 4.
    """
    bucket = (F.unix_timestamp(F.col(ts)) / width_s).cast("long") * width_s
    rolled = (
        df.select(F.col(key), bucket.alias("bucket_start"), F.col(value))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value), 4).alias("total"),
        )
    )
    if not fill:
        return rolled
    spine = (
        rolled.groupBy(key)
        .agg(
            F.min("bucket_start").alias("__lo"),
            F.max("bucket_start").alias("__hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(width_s))
            ).alias("bucket_start"),
        )
    )
    return (
        spine.join(rolled, [key, "bucket_start"], "left")
        .select(
            key,
            "bucket_start",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


def funnel(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
):
    """Ordered funnel analysis: per user, how far through ``steps``
    they progressed, where step i+1 counts only when it occurs
    STRICTLY AFTER the user's first qualifying step i (the product
    analytics "signup → activate → purchase" question, which a plain
    per-type min-timestamp gets wrong when events arrive out of
    order).

    Output: one row per user that reached step 1, with
    ``steps_completed`` and the first qualifying timestamp per step
    (``t1..tk``, null past the drop-off point).

    Scale shape: one conditional aggregation per funnel step, each
    grouped on the user key — the iterative dependency (t_{i+1} needs
    t_i) is inherent to the semantics, but every stage aggregates the
    SAME user-partitioned exchange of the events scan, and each
    intermediate result is one row per qualifying user (monotonically
    shrinking). The events table is scanned once per step with only
    (user, ts) columns for that step's type — pushdown keeps each
    scan narrow; no window sort over full history anywhere.
    """
    from pyspark.sql import functions as F

    cur = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.where(F.col(type_col) == step).select(
            F.col(user_col), F.col(ts_col).alias("__ts")
        )
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(user_col, *[f"t{j}" for j in range(1, i)])
            # min over only the qualifying (strictly-later) events;
            # a user with none keeps the row with a null t_i — the
            # drop-off point, not a dropped row
            .agg(
                F.min(
                    F.when(F.col("__ts") > F.col(f"t{i-1}"), F.col("__ts"))
                ).alias(f"t{i}")
            )
        )
    k = len(steps)
    completed = sum(
        F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0) for i in range(1, k + 1)
    )
    return cur.select(
        user_col, completed.alias("steps_completed"),
        *[f"t{i}" for i in range(1, k + 1)],
    )


def rolling_zscore(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    tiebreak: str,
    nrows: int = 5,
    z: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly flags: each observation compared
    against the mean/stddev of its own trailing ``nrows`` values
    (STRICTLY prior — the current row never masks itself), flagged
    when ``|v − mean| > z·stddev``. Rows without enough history (no
    prior rows, or zero variance) are never flagged.

    Scale shape: one window over the series key (events-per-key
    partitions, never corpus-wide), computed in a single pass —
    mean and stddev share the frame. No self-join, no Python.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key)
        .orderBy(ts, tiebreak)
        .rowsBetween(-nrows, -1)
    )
    v = F.col(value).cast("double")
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    flag = (
        F.when(
            std.isNotNull() & (std > 0) & (F.abs(v - mean) > z * std), 1
        ).otherwise(0)
    )
    return df.select(
        key,
        ts,
        F.col(tiebreak),
        v.alias(value),
        F.round(mean, 6).alias("trail_mean"),
        F.round(std, 6).alias("trail_std"),
        flag.alias("is_anomaly"),
    )


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts: str,
    state: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: collapse a
    per-key event stream into validity intervals of its ``state``
    column — one row per run of consecutive identical states, with
    ``valid_from``/``valid_to`` timestamps (``valid_to`` null for the
    key's current state). The CDC-to-dimension-table primitive.

    ``tiebreak`` orders same-timestamp events deterministically.

    Scale shape: two window passes and one aggregation, ALL
    partitioned by the same key — one exchange total, reused across
    stages; per-key partitions are event-history sized, never
    corpus-sized. Run detection is lag + running-sum (the classic
    gaps-and-islands rewrite), null-safe on the state column.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    changed = F.when(
        F.col(state).eqNullSafe(F.lag(state).over(w)), 0
    ).otherwise(1)
    runs = (
        df.select(key, ts, tiebreak, state)
        .withColumn("__chg", changed)
        .withColumn("__run", F.sum("__chg").over(w))
    )
    iv = runs.groupBy(key, "__run").agg(
        F.min(state).alias(state),  # constant within a run
        F.min(ts).alias("valid_from"),
    )
    # __run (monotone in event order) breaks valid_from ties: two runs
    # born from same-timestamp events would otherwise make valid_to
    # assignment nondeterministic across engines/runs
    w2 = Window.partitionBy(key).orderBy("valid_from", "__run")
    return iv.select(
        key,
        state,
        F.col("valid_from"),
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def transition_matrix(
    df: DataFrame,
    key: str,
    ts: str,
    state: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each observed (state → next_state) pair, the count
    and the row-normalized probability — the behavioral-model summary
    behind "what do users do after X" and sequence-anomaly baselines.

    Scale shape: one lead() window per key (event-history-sized
    partitions), then a (from, to) aggregation with map-side combine —
    the output is |states|² at most; the normalizing row totals
    re-derive from the pair counts (no second scan).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    pairs = (
        df.select(
            F.col(state).alias("from_state"),
            F.lead(state).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__t"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("p"),
    )


def cohort_retention(
    df,
    user_col: str,
    ts_col: str,
    bucket: str = "week",
):
    """Cohort retention matrix: users grouped by first-activity
    period (their cohort), counted by how many were active again k
    periods later. Output one row per (cohort, period_offset) with
    the active-user count and the retention rate against the cohort's
    size — the classic growth-analytics triangle.

    ``bucket`` is any ``date_trunc`` unit (week/month/day).

    Scale shape: three aggregations, all keyed narrowly — (user) for
    first-activity, (user, period) DISTINCT for activity, (cohort,
    offset) for the matrix — each with map-side partial aggregation.
    The only join is activity-against-first-activity on the user key,
    the same exchange the first aggregation produced (AQE reuses it);
    cohort sizes re-derive from offset 0, not a second scan.
    """
    from pyspark.sql import functions as F

    act = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc(bucket, F.col(ts_col)).alias("p"),
    ).distinct()
    first = act.groupBy("u").agg(F.min("p").alias("c0"))
    # integer period offset: whole buckets between cohort start and the
    # activity period. Weeks divide cleanly by 7-day spans; months use
    # months_between (exact on truncated month starts).
    if bucket == "month":
        off = F.months_between(F.col("p"), F.col("c0")).cast("long")
    else:
        days = {"day": 1, "week": 7}[bucket]
        off = (F.datediff(F.col("p"), F.col("c0")) / days).cast("long")
    mat = (
        act.join(first, "u")
        .select(F.col("c0").alias("cohort"), off.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    size = mat.where(F.col("period_offset") == 0).select(
        F.col("cohort"), F.col("active_users").alias("__cohort_size")
    )
    return (
        mat.join(size, "cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            "period_offset",
            "active_users",
            F.round(
                F.col("active_users") / F.col("__cohort_size"), 6
            ).alias("retention"),
        )
    )


def rfm(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) per user — the classic
    activity-segmentation rollup: recency as milliseconds between the
    user's last event and the corpus's last event (self-contained "as
    of the data's end", no wall clock — replayable by any engine),
    frequency as the event count, monetary as the value sum rounded 4
    (the events-family float convention). Output: (user, recency_ms,
    frequency, monetary, last_ts).

    Scale shape: ONE user-keyed aggregation (map-side combined) plus a
    1-row corpus-max aggregate joined back as a scalar broadcast — no
    window over event history, nothing user-unbounded."""
    per_user = events.groupBy(F.col(user_col)).agg(
        F.max(ts_col).alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(value_col), 4).alias("monetary"),
    )
    corpus_max = events.agg(F.max(ts_col).alias("__end"))
    return (
        per_user.crossJoin(F.broadcast(corpus_max))
        .select(
            F.col(user_col),
            (F.unix_millis(F.col("__end")) - F.unix_millis(F.col("last_ts")))
            .alias("recency_ms"),
            "frequency",
            "monetary",
            "last_ts",
        )
    )


def interarrival_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival-time statistics — the burstiness /
    cadence profile (bot-vs-human screens, session-gap calibration for
    the sessionizer's threshold): consecutive-event gaps in
    milliseconds under the deterministic (ts, tiebreak) order, reduced
    to count, min, max, and mean. The mean is rounded to 2 decimals,
    NOT 6: mean gaps reach ~3e9 ms, where a double's ulp (~1e-6) is
    the same order as a 6-decimal rounding unit, so cross-engine
    6-decimal agreement is numerically impossible — centisecond
    precision is far above the ulp at any plausible gap magnitude
    (verified against DuckDB at 10x bench scale). Users with a single
    event report n_gaps = 0 and null gap stats.

    Scale shape: one user-partitioned lag window (the events-family
    exchange every windowed query shares) feeding one user-keyed
    aggregation; nothing crosses partitions but (user, gap) rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    gap = F.unix_millis(F.col(ts_col)) - F.unix_millis(
        F.lag(ts_col).over(w)
    )
    gapped = events.select(F.col(user_col), gap.alias("__gap_ms"))
    return gapped.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap_ms").alias("n_gaps"),
        F.min("__gap_ms").alias("min_gap_ms"),
        F.max("__gap_ms").alias("max_gap_ms"),
        F.round(F.avg("__gap_ms"), 2).alias("mean_gap_ms"),
    )
