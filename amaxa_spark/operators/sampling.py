"""Deterministic sampling / split-assignment operators.

Training-data pipelines need reproducible row selection that is stable
across engines, runs, and cluster sizes — so everything here derives
its randomness from md5 over the row's stable key, never from an RNG
or row position. That makes each operator (a) exactly replayable by
the DuckDB oracle, (b) shuffle-free (a per-row projection + filter,
no global ordering), and (c) safe at 100 TB: assignment is embarrassingly
parallel and re-runs assign identical splits even after repartitioning.

The hash fraction is ``int(md5(salt || key)[:8], 16) / 2^32`` — 32 bits
of the digest mapped to [0, 1). Buckets use the same digest mod 10^4,
giving 0.01% split granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 10_000


def _hash_bucket(key_col, salt: str):
    """Deterministic bucket in [0, 10000) from md5(salt:key)."""
    digest = F.md5(F.concat(F.lit(f"{salt}:"), key_col.cast("string")))
    return (F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") % _BUCKETS).cast(
        "int"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    by hashing its id — reproducible, order-independent, and disjoint.

    ``fractions`` maps split name → fraction; fractions must sum to
    ≤ 1.0 and splits are carved from consecutive bucket ranges in the
    given order (rows past the last boundary fall into the final
    split). Returns the input plus (``bucket``, ``split``).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = _hash_bucket(F.col(id_col), salt)
    out = df.withColumn("bucket", bucket)
    expr = None
    lo = 0
    names = list(fractions)
    for name in names[:-1]:
        lo += int(round(fractions[name] * _BUCKETS))
        cond = F.col("bucket") < lo
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return out.withColumn("split", expr)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    stratum_col: str | None = None,
    salt: str = "budget",
) -> DataFrame:
    """Fill a token budget deterministically: rank rows by id hash
    (a reproducible shuffle), take the running token total in that
    order, and keep every row whose PREVIOUS cumulative total is
    still under the budget — so the budget is crossed at most once,
    by the final kept row. With ``stratum_col``, each stratum fills
    its own budget (how "10B tokens at these mixture weights" is
    actually cut).

    Scale shape: one window (cumulative sum) partitioned by stratum —
    a per-stratum sort. For a single global budget the sort is
    global; shard the budget across strata when that matters (that is
    also the statistically better cut).
    """
    order = _hash_bucket(F.col(id_col), salt)
    part = [stratum_col] if stratum_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(order.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_total = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return (
        df.withColumn("__prev", prev_total)
        .where(F.col("__prev") < budget)
        .drop("__prev")
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its hash
    fraction is below its stratum's rate. This is how corpus mixing
    weights (e.g. upweight books, downsample web crawl) are applied
    reproducibly — the kept set is identical regardless of
    partitioning or execution order, unlike ``df.sampleBy`` (seeded
    per-partition RNG).
    """
    bucket = _hash_bucket(F.col(id_col), salt)
    rate = None
    for name, r in rates.items():
        cond = F.col(stratum_col) == name
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = F.lit(default_rate) if rate is None else rate.otherwise(
        F.lit(default_rate)
    )
    return df.where(bucket < (rate * _BUCKETS).cast("int"))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    target_rows: int,
    weights: dict[str, float] | None = None,
    alpha: float | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing with DATA-DERIVED keep rates: resample each
    stratum (source/domain/language) so the output approximates
    ``target_rows`` rows distributed by the target mixture — either
    explicit ``weights`` (normalized) or temperature scaling
    ``alpha`` (share_s = n_s^alpha / Σ n^alpha, the multilingual
    upsampling rule: alpha<1 flattens the source distribution, 1
    keeps it, 0 makes it uniform). Exactly one of ``weights`` /
    ``alpha`` must be given.

    Where :func:`stratified_sample` applies rates the caller already
    knows, this derives them from the corpus itself inside the plan —
    no driver-side counts, so the same query runs unchanged at 100 TB:
    per-stratum keep rate = min(1, target_rows·share_s / n_s), rounded
    to 6 decimals, applied as a hash threshold (floor(rate·10⁴) over
    the md5 bucket), so membership stays deterministic and
    engine-replayable.

    Scale shape: one count aggregation (map-side combine, result is
    #strata rows), a scalar total (one-row aggregate joined via the
    cross-join-of-one-row pattern), a join of the corpus against the
    #strata-row rate dim (AQE broadcasts it — not forced), and the
    embarrassingly-parallel hash filter. No global sort anywhere.
    """
    if (weights is None) == (alpha is None):
        raise ValueError("pass exactly one of weights= / alpha=")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    if weights is not None:
        total = float(sum(weights.values()))
        share = None
        for name, wv in weights.items():
            cond = F.col(stratum_col) == name
            lit = F.lit(wv / total)
            share = F.when(cond, lit) if share is None else share.when(cond, lit)
        rates = counts.select(
            stratum_col, "__n", share.otherwise(F.lit(0.0)).alias("__share")
        )
    else:
        w = counts.select(
            stratum_col,
            "__n",
            F.pow(F.col("__n").cast("double"), F.lit(float(alpha))).alias("__w"),
        )
        tot = w.agg(F.sum("__w").alias("__tw"))
        rates = w.crossJoin(tot).select(
            stratum_col, "__n", (F.col("__w") / F.col("__tw")).alias("__share")
        )
    rate = F.round(
        F.least(
            F.lit(1.0), F.lit(float(target_rows)) * F.col("__share") / F.col("__n")
        ),
        6,
    )
    dim = rates.select(
        stratum_col, F.floor(rate * _BUCKETS).cast("int").alias("__thr")
    )
    bucket = _hash_bucket(F.col(id_col), salt)
    return df.join(dim, stratum_col).where(bucket < F.col("__thr")).drop("__thr")


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "gsplit",
) -> DataFrame:
    """Group-aware split assignment — the FIX for
    :func:`split_leakage`: the split is derived from the GROUP key's
    hash (near-dup cluster, domain, author…), so every member of a
    group lands in the same split by construction and train/test
    contamination through intra-group similarity is impossible.

    Same bucket semantics as :func:`hash_split` (md5, 0.01%
    granularity, reproducible across engines and partitionings);
    fractions now apportion GROUPS, so split sizes track group-mass,
    not row counts — report per-split row counts downstream if exact
    row proportions matter.
    """
    return hash_split(df, group_col, fractions, salt)


def split_leakage(
    members: DataFrame,
    splits: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    split_col: str = "split",
) -> DataFrame:
    """Train/test leakage audit: near-dup clusters whose members span
    MORE THAN ONE split — the evaluation-integrity check that makes
    dedup and splitting compose (a test doc with a train near-dup
    inflates eval scores; a random split leaks every cluster larger
    than one with probability ≈ 1).

    Input: cluster membership (:func:`~amaxa_spark.operators.dedup.
    cluster_duplicates` output) and split assignment
    (:func:`hash_split` output). Output one row per leaking cluster:
    (cluster, n_members, n_splits, splits as a sorted comma string).
    The fix is group-aware splitting: hash the CLUSTER id, not the
    doc id, so clusters move atomically.

    Scale shape: one id-key join on duplicate-sized frames, one
    cluster aggregation with map-side combine; |splits| ≤ a handful
    so the collect_set is bounded.
    """
    j = members.join(splits, id_col)
    return (
        j.groupBy(F.col(cluster_col).alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct(split_col).alias("n_splits"),
            F.concat_ws(
                ",", F.sort_array(F.collect_set(split_col))
            ).alias("splits"),
        )
        .where(F.col("n_splits") > 1)
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-RES), derandomized: each row draws u from its id hash and
    ranks by ``ln(u)/w`` descending — equivalent to the classic
    ``u^(1/w)`` key (ln is monotone) but avoiding ``pow``, whose
    last-ulp behavior differs across engines. Rows with weight ≤ 0
    are excluded; the top-``k`` keys win, so inclusion probability
    tracks weight while staying exactly replayable (same ids ⇒ same
    sample, independent of partitioning or cluster size).

    Scale shape: a per-row projection + TakeOrdered top-k — no
    shuffle, no RNG state, embarrassingly parallel.
    """
    digest = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    u32 = F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
    u = (u32 + 0.5) / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("sample_key", F.round(key, 9))
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def percentile_filter(
    df: DataFrame,
    value_col: str,
    by: str,
    p: float,
    keep: str = "above",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group percentile gate: keep rows whose ``value_col`` is at
    or above (``keep="above"``) / strictly below (``"below"``) their
    group's p-th percentile — the "drop the bottom-quartile quality
    docs per language" curation primitive, with the threshold derived
    from the data INSIDE the plan (no magic constants drifting out of
    date as the corpus moves).

    Scale shape: one per-group percentile aggregate (group-cardinality
    rows) broadcast back onto the corpus — a projection+filter, no
    corpus shuffle. ``exact=True`` uses the exact interpolated
    percentile (deterministic, oracle-replayable; buffers each
    group's values during aggregation). At extreme per-group volumes
    set ``exact=False`` for the mergeable ``approx_percentile``
    sketch — fixed memory per group, rank error ≤ 1/accuracy.
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    v = F.col(value_col).cast("double")
    agg = (
        F.percentile(v, F.lit(float(p)))
        if exact
        else F.percentile_approx(v, F.lit(float(p)), F.lit(accuracy))
    )
    thr = df.groupBy(by).agg(F.round(agg, 6).alias("__thr"))
    out = df.join(F.broadcast(thr), by)
    # the gate compares against the SAME rounded threshold that is
    # emitted, so the verdict is reproducible from the output row
    cond = (
        F.col(value_col) >= F.col("__thr")
        if keep == "above"
        else F.col(value_col) < F.col("__thr")
    )
    return out.where(cond).withColumn(
        "threshold", F.col("__thr")
    ).drop("__thr")


def group_cap(
    df: DataFrame, id_col: str, by: str, k: int, salt: str = "cap"
) -> DataFrame:
    """Per-group quota (RefinedWeb-style domain cap): keep at most
    ``k`` rows per ``by`` group, chosen deterministically by id-hash
    order — so the survivors are a reproducible "random" sample,
    independent of partitioning, and a re-crawl that adds rows can
    only swap members, never inflate a group past its cap.

    Scale shape: one window sort per group (hash order, id tiebreak).
    Groups are independent, so skewed sources cost only their own
    partition's sort; no global ordering exists anywhere.
    """
    order = _hash_bucket(F.col(id_col), salt)
    w = Window.partitionBy(by).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def shuffle_shard(
    df: DataFrame, id_col: str, n_shards: int, salt: str = "shard"
) -> DataFrame:
    """Deterministic global shuffle + sharding for training output:
    assign every row a shard (id-hash mod ``n_shards``) and a position
    within its shard (rank in 60-bit-hash order). Together (shard,
    pos) define a reproducible random permutation of the corpus that
    any engine can replay — the standard final step before writing
    training shards, without ``ORDER BY rand()``'s nondeterminism.

    Scale shape: the only sort is per-shard; shards are written
    independently (``partitionBy(shard)``), so the permutation never
    materializes globally.
    """
    digest = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    # 60 bits: fits int64 in both engines, ~no ties at trillions of rows
    h = F.conv(F.substring(digest, 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", (F.col("__h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("__h")
    )
