"""Corpus-level distribution statistics.

Complements the content-level snapshot ops (``dedup.corpus_diff``
tells you WHICH documents changed; these tell you whether the
corpus's *shape* moved): drift of a categorical distribution between
two snapshots, the monitoring primitive behind "did the
source/language/domain mix shift under us" alarms on a recurring
crawl.

Everything is native Column algebra over grouped counts — exact, no
sketches (those live in ``approx.py``), no Python, and expressible in
ANSI SQL so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    by: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into its group's
    [p_lo, p_hi] percentile band — outlier-robust normalization for
    metric columns before averaging or training (the heavy-tail tamer
    that dropping rows can't be, because row counts must survive).

    Returns the input plus ``<value>_wins`` (clamped, rounded 6) and
    the two thresholds. Scale shape: ONE percentile aggregate per
    group (both percentiles in the same pass) broadcast back — a
    projection, no corpus shuffle; same contract as
    ``sampling.percentile_filter``.
    """
    v = F.col(value_col).cast("double")
    # clamp against the SAME rounded thresholds that are emitted, so
    # the clamped value is reproducible from the output row's
    # lo_thr/hi_thr (no boundary disagreement with a consumer)
    thr = df.groupBy(by).agg(
        F.round(F.percentile(v, F.lit(float(p_lo))), 6).alias("__lo"),
        F.round(F.percentile(v, F.lit(float(p_hi))), 6).alias("__hi"),
    )
    return (
        df.join(F.broadcast(thr), by)
        .select(
            "*",
            F.round(
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), 6
            ).alias(f"{value_col}_wins"),
        )
        .withColumn("lo_thr", F.col("__lo"))
        .withColumn("hi_thr", F.col("__hi"))
        .drop("__lo", "__hi")
    )


def gini_coefficient(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """Gini coefficient of the per-key row distribution — the
    one-number inequality summary behind :func:`key_skew_profile`'s
    per-key view (0 = perfectly uniform keys, → 1 = one key owns
    everything): ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n`` over the
    ascending-sorted per-key counts. Returns one row:
    (n_keys, total, gini).

    Scale shape: no global sort and no single-partition window
    anywhere.  Rows collapse to per-key counts (map-side combine),
    then to COUNT-OF-COUNTS ``(v, c_v)`` — c_v keys share count v —
    which is at most ``√(2·rows)`` rows (Σ of distinct counts ≤ row
    total).  Ranks of a tie-group are consecutive, so its rank-sum is
    closed-form: ``Σ i·x over keys with count v =
    v·(c_v·S_<v + c_v·(c_v+1)/2)`` where ``S_<v`` is the number of
    keys with smaller counts.  The prefix ``S_<v`` is computed with a
    two-level cumulative sum — geometric buckets of v (``⌊8·log₂v⌋``,
    data-independent and order-preserving) give PARTITIONED
    within-bucket windows, and the ≤ ~250-row bucket-offset frame is
    a broadcast self-join — so the largest window partition holds one
    ~9% geometric slice of the distinct count values, never all of
    them.  Per-key ordering ties (same count) don't matter: tied keys
    carry the same x, so Σ i·x is invariant under within-tie order.
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    cc = counts.groupBy(F.col("n").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cc = cc.withColumn(
        "b", F.floor(F.log2(F.col("v").cast("double")) * 8).cast("int")
    )
    bt = cc.groupBy("b").agg(F.sum("c").alias("bc"))
    off = (
        bt.alias("x")
        .join(F.broadcast(bt.alias("y")), F.col("y.b") < F.col("x.b"), "left")
        .groupBy(F.col("x.b").alias("b"))
        .agg(F.coalesce(F.sum("y.bc"), F.lit(0)).alias("off"))
    )
    w = (
        Window.partitionBy("b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        cc.withColumn("s_in", F.coalesce(F.sum("c").over(w), F.lit(0)))
        .join(F.broadcast(off), "b")
        .select("v", "c", (F.col("off") + F.col("s_in")).alias("s_prev"))
    )
    contrib = F.col("v") * (
        F.col("c") * F.col("s_prev")
        + F.col("c") * (F.col("c") + 1) / 2.0
    )
    n_keys = F.coalesce(F.sum("c"), F.lit(0))
    total = F.sum(F.col("v") * F.col("c"))
    return ranked.agg(
        n_keys.alias("n_keys"),
        total.alias("total"),
        F.round(
            2.0 * F.sum(contrib) / (n_keys * total)
            - (n_keys + 1.0) / n_keys,
            9,
        ).alias("gini"),
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Key-skew diagnostic: the top-``top`` hottest keys with their
    row share and the cumulative share — the "find the key that will
    burn the shuffle before it does" tool that motivates
    ``skew.salted_join`` / AQE skew handling.

    Output one row per hot key: (key, n, share, cum_share, rank).
    Scale shape: one hash aggregation to per-key counts (map-side
    combined; output is key-cardinality-sized), one 1-row total
    broadcast, and a top-k TakeOrdered + window over ``top`` rows
    only.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__t"))
    hot = (
        counts.orderBy(F.col("n").desc(), F.col("key").asc())
        .limit(top)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.col("n").desc(), F.col("key").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return hot.select(
        "key",
        "n",
        F.round(F.col("n") / F.col("__t"), 6).alias("share"),
        F.round(F.sum("n").over(w) / F.col("__t"), 6).alias("cum_share"),
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), F.col("key").asc()))
        .alias("rank"),
    )


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
    by: str | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column, optionally per
    group: ``nbins`` equal bins over [lo, hi], values outside the
    range dropped, ``v == hi`` landing in the last bin (numpy edge
    convention). Every bin is materialized — empty bins report 0 —
    so consumers see a dense, plottable series.

    Scale shape: one hash aggregation on (group, bin) with map-side
    combine — the shuffle carries at most |groups|·nbins rows. The
    dense spine is |groups| distinct keys × a ``sequence`` explode
    (output-sized) left-joined with the counts; no window, no
    Python.
    """
    v = F.col(value_col).cast("double")
    width = (hi - lo) / nbins
    raw_bin = F.floor((v - lo) * nbins / (hi - lo)).cast("int")
    bin_ = F.when(v == hi, nbins - 1).otherwise(raw_bin)
    keys = [by] if by else []
    counts = (
        df.where((v >= lo) & (v <= hi))
        .select(*keys, bin_.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = (
        (df.select(by).distinct() if by else df.sparkSession.range(1).select())
        .select(
            *keys,
            F.explode(F.sequence(F.lit(0), F.lit(nbins - 1))).alias("bin"),
        )
    )
    return spine.join(counts, [*keys, "bin"], "left").select(
        *keys,
        "bin",
        F.round(F.lit(lo) + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.lit(lo) + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
        F.coalesce("n", F.lit(0)).alias("n"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: list[str],
    scale: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns, one row
    per (col_a < col_b) pair — the multicollinearity sweep of a
    feature audit.

    All sums (Σx, Σx², Σxy) run in DECIMAL after rounding inputs to
    ``scale`` digits, so they are EXACT and order-independent — the
    correlation is then pure arithmetic on exact sums, reproducible
    bit-for-bit across engines and partitionings (double sums would
    drift in the last bits and make the rounded result flap). The
    output correlation is always rounded to 6 decimals; ``scale``
    controls only the input quantization.

    Rows with a NULL in ANY of ``cols`` are excluded up front
    (complete-case analysis) — mixing an all-rows n with
    null-skipping sums would silently bias every pair's correlation.

    Scale shape: every pair shares ONE aggregation pass over one
    scan (k columns → k(k+3)/2 aggregates, map-side combined to a
    single row); the unpivot is driver-free arithmetic on that row.
    """
    for c in cols:
        df = df.where(F.col(c).isNotNull())
    # project to the k numeric columns, then spread a single-partition
    # scan across idle cores (adaptive no-op at scale): the k(k+3)/2
    # decimal partial sums are the whole cost and are exact /
    # order-independent, so parallel partials are bit-identical
    from amaxa_spark.operators.similarity import _scale_out

    df = _scale_out(df.select(*cols))
    # 18,6: products are decimal(37,12) (inside both engines' 38-digit
    # cap) and their sums stay exact for ~1e26 of integer headroom
    dec = f"decimal(18,{scale})"
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        v = F.round(F.col(c).cast("double"), scale).cast(dec)
        aggs.append(F.sum(v).alias(f"__s{i}"))
        aggs.append(F.sum(v * v).alias(f"__q{i}"))
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            vi = F.round(F.col(cols[i]).cast("double"), scale).cast(dec)
            vj = F.round(F.col(cols[j]).cast("double"), scale).cast(dec)
            aggs.append(F.sum(vi * vj).alias(f"__p{i}_{j}"))
    m = df.agg(*aggs)
    rows = []
    n = F.col("__n").cast("double")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            sx = F.col(f"__s{i}").cast("double")
            sy = F.col(f"__s{j}").cast("double")
            qx = F.col(f"__q{i}").cast("double")
            qy = F.col(f"__q{j}").cast("double")
            pxy = F.col(f"__p{i}_{j}").cast("double")
            num = n * pxy - sx * sy
            den = F.sqrt(n * qx - sx * sx) * F.sqrt(n * qy - sy * sy)
            qa = cols[i].replace("'", "''")
            qb = cols[j].replace("'", "''")
            rows.append(f"'{qa}', '{qb}', __c{i}_{j}")
            m = m.withColumn(
                f"__c{i}_{j}",
                F.round(num / den, 6),
            )
    return m.select(
        F.expr(
            f"stack({len(rows)}, " + ", ".join(rows)
            + ") as (col_a, col_b, corr)"
        )
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pointwise mutual-information decomposition between two
    categorical columns: one row per observed (a, b) cell with its
    count and MI contribution ``p(a,b)·ln(p(a,b)/(p(a)p(b)))`` —
    Σ mi_term is the mutual information (the categorical-association
    sweep; ``correlation_matrix`` is the numeric twin, PSI/KS the
    across-snapshot ones).

    Scale shape: ONE (a, b) pairs aggregation (map-side combined,
    output is cell-cardinality-sized); both margins derive from the
    joint by re-aggregation — the source is never re-scanned — and
    the 1-row total broadcasts.
    """
    # NULL categories are excluded from BOTH the cells and the
    # margins/total (null-unsafe joins would otherwise drop their
    # cells while still counting them in the denominators, making
    # Σ mi_term the MI of no distribution at all)
    joint = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ma = joint.groupBy("a").agg(F.sum("n").alias("na"))
    mb = joint.groupBy("b").agg(F.sum("n").alias("nb"))
    tot = joint.agg(F.sum("n").alias("__t"))
    p_ab = F.col("n") / F.col("__t")
    # products in DOUBLE: n·t in int64 overflows near 1e19 — easily
    # exceeded when both factors are trillion-row counts
    ratio = (
        F.col("n").cast("double") * F.col("__t").cast("double")
    ) / (F.col("na").cast("double") * F.col("nb").cast("double"))
    return (
        joint.join(F.broadcast(ma), "a")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n",
            F.round(p_ab * F.log(ratio), 9).alias("mi_term"),
        )
    )


def ks_statistic(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between snapshots of a
    numeric column: ``max |CDF_old(v) − CDF_new(v)|`` over observed
    values, with the argmax value — the nonparametric drift test for
    NUMERIC columns (PSI's complement, which handles categoricals).
    Returns one row: (ks, at_value).

    Scale shape: each side collapses to per-value counts first
    (map-side combine), then a full-outer join on the value and ONE
    global-order cumulative window over the DISTINCT values — the
    global sort is over value cardinality, not row count. For
    continuous columns with unbounded cardinality, pre-bucket with
    :func:`fixed_width_histogram` widths first; the KS of the
    bucketed CDF bounds the true KS within one bucket's mass.
    """
    # nulls carry no position on the number line — excluded from both
    # CDFs (they'd otherwise split into two never-matching join rows)
    co = (
        old.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(F.count(F.lit(1)).alias("n1"))
    )
    cn = (
        new.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("double").alias("v"))
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    j = (
        co.join(cn, "v", "full_outer")
        .select(
            "v",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    totals = j.agg(
        F.sum("n1").alias("__t1"), F.sum("n2").alias("__t2")
    )
    cdfs = j.crossJoin(F.broadcast(totals)).select(
        "v",
        (F.sum("n1").over(w) / F.col("__t1")).alias("__c1"),
        (F.sum("n2").over(w) / F.col("__t2")).alias("__c2"),
    )
    gap = F.round(F.abs(F.col("__c1") - F.col("__c2")), 9)
    return (
        cdfs.select("v", gap.alias("__gap"))
        .orderBy(F.col("__gap").desc(), F.col("v").asc())
        .limit(1)
        .select(F.col("__gap").alias("ks"), F.col("v").alias("at_value"))
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    eps: float = 0.5,
) -> DataFrame:
    """Population-stability-index (PSI) drift between two snapshots of
    a categorical column. Returns one row per key observed in either
    snapshot: counts, smoothed shares, and the key's PSI contribution
    ``(p_new − p_old)·ln(p_new/p_old)`` rounded to 9 decimals —
    Σ psi_term is the headline PSI (≳0.2 is the conventional
    "investigate" threshold). Laplace smoothing ``eps`` keeps
    appearing/vanishing keys finite and deterministic:
    p = (n + eps) / (total + eps·K) with K = keys in either snapshot.

    Scale shape: each side collapses to per-key counts first
    (map-side combine — the shuffle carries one row per key per
    side), then a full outer join on the key and ONE 1-row scalar
    aggregate (totals + K) broadcast-crossed in. Key cardinality,
    not corpus size, bounds every post-aggregation frame.
    """
    co = old.groupBy(F.col(key_col).alias("__ko")).agg(
        F.count(F.lit(1)).alias("n_old")
    )
    cn = new.groupBy(F.col(key_col).alias("__kn")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # null-safe join: a NULL category present on both sides is ONE
    # key, not a vanished-plus-appeared pair (which would fake drift)
    j = (
        co.join(cn, F.col("__ko").eqNullSafe(F.col("__kn")), "full_outer")
        .select(
            F.coalesce(F.col("__ko"), F.col("__kn")).alias("key"),
            F.coalesce(F.col("n_old"), F.lit(0)).alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
    )
    totals = j.agg(
        F.sum("n_old").cast("double").alias("__to"),
        F.sum("n_new").cast("double").alias("__tn"),
        F.count(F.lit(1)).cast("double").alias("__k"),
    )
    e = F.lit(float(eps))
    p_old = (F.col("n_old") + e) / (F.col("__to") + e * F.col("__k"))
    p_new = (F.col("n_new") + e) / (F.col("__tn") + e * F.col("__k"))
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n_old",
            "n_new",
            F.round(p_old, 9).alias("p_old"),
            F.round(p_new, 9).alias("p_new"),
            F.round((p_new - p_old) * F.log(p_new / p_old), 9).alias(
                "psi_term"
            ),
        )
    )
