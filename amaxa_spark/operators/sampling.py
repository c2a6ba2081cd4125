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
