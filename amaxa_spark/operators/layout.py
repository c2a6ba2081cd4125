"""Multi-dimensional file layout: Z-order (Morton) clustering keys.

A table filtered on TWO dimensions (e.g. date AND tenant) can only
data-skip on one of them under a lexicographic sort. Interleaving the
dimensions' bits into one Morton key makes rows close in EITHER
dimension land in the same files, so parquet min/max row-group stats
prune for both predicates at once — the Delta/Iceberg ``ZORDER BY``
idea, built here from native bit arithmetic (no UDF, no library).

Scale shape: the key is a pure per-row projection;
``write_zordered`` pays ONE range repartition on the key (the same
shuffle a plain global sort costs) and writes files whose key ranges
are disjoint. Everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list, bits: int = 8) -> F.Column:
    """Morton-interleave the low ``bits`` bits of each integer column
    (values must already be bucketed into [0, 2^bits)). With k
    columns, bit i of column j lands at position ``i*k + j`` — a
    (k·bits)-bit key where a unit step in any dimension moves the key
    locally.
    """
    k = len(cols)
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c) if isinstance(c, str) else c
        v = v.cast("long")
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("long")
    return key


def file_stats_index(
    spark, path: str, cols: list[str], paths: list[str] | None = None
) -> "DataFrame":
    """Build a file-skipping index from parquet footers: one row per
    (file, column) with min/max — the Iceberg/Delta manifest-stats
    idea without the table format. Footer READS are executor-side
    (paths parallelized, ``mapInPandas`` opens each footer), so
    indexing a million-file table fans out instead of looping on the
    driver; the index itself is file-count-sized and is what makes
    :func:`read_pruned` skip files without opening them.

    File LISTING defaults to a local flat ``part-*.parquet`` glob —
    pass ``paths`` explicitly for object stores or nested/partitioned
    layouts (whatever lister fits the store; the executor-side footer
    reads work the same). An empty listing raises rather than
    producing an index that silently prunes everything.
    """
    import glob as _glob

    if paths is None:
        paths = sorted(_glob.glob(f"{path}/part-*.parquet"))
    if not paths:
        raise ValueError(
            f"file_stats_index: no parquet files found under {path!r} — "
            "pass `paths` explicitly for non-local or nested layouts"
        )
    pdf_schema = "path string, col string, vmin double, vmax double"

    def footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.read_metadata(p)
                names = md.schema.names
                for c in cols:
                    ci = names.index(c)
                    vmin = vmax = None
                    for g in range(md.num_row_groups):
                        st = md.row_group(g).column(ci).statistics
                        if st is None or not st.has_min_max:
                            continue
                        mn, mx = float(st.min), float(st.max)
                        vmin = mn if vmin is None else min(vmin, mn)
                        vmax = mx if vmax is None else max(vmax, mx)
                    rows.append((p, c, vmin, vmax))
            yield pd.DataFrame(rows, columns=["path", "col", "vmin", "vmax"])

    return (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(min(len(paths), 64) or 1)
        .mapInPandas(footers, schema=pdf_schema)
    )


def read_pruned(
    spark, path: str, index: "DataFrame", col: str, lo: float, hi: float
) -> tuple["DataFrame", int, int]:
    """Scan only the files whose [min, max] for ``col`` intersects
    [lo, hi] (per the stats index), with the residual filter applied
    on top. Returns (df, files_read, files_total) so callers can see
    the skip rate. Files with no stats are conservatively read.

    The keep-decision is evaluated DISTRIBUTED — the driver never
    materializes the full (file, column) stats index (at 100 TB with
    10⁵–10⁶ files that index is itself a table).  Only the matched
    paths come back, which is the irreducible driver cost of handing
    a path list to ``spark.read``; a fully driverless variant would
    pass the stats frame to a DataSourceV2 scan filter, noted in
    SCALE_NOTES.md."""
    rows = index.where(F.col("col") == col).select(
        "path",
        (
            F.col("vmin").isNull()
            | F.col("vmax").isNull()
            | ~((F.col("vmax") < lo) | (F.col("vmin") > hi))
        ).alias("__keep"),
    )
    # ONE job over the index: total and the keep list come from the
    # same evaluation, so a re-evaluated (or non-deterministic) index
    # source can never make them inconsistent — and the driver still
    # receives only the matched paths plus two counters, not the
    # pruned-away majority
    agg = rows.groupBy("__keep").agg(
        F.count(F.lit(1)).alias("n"),
        F.collect_list(F.when(F.col("__keep"), F.col("path"))).alias("paths"),
    ).collect()
    total = sum(r["n"] for r in agg)
    keep = [p for r in agg if r["__keep"] for p in r["paths"]]
    if not keep:
        df = spark.read.parquet(path).where(F.lit(False))
        return df, 0, total
    df = spark.read.parquet(*keep).where(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )
    return df, len(keep), total


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Morton key of ``cols`` — each file covers a compact
    key range, so min/max stats prune scans filtered on ANY of the
    interleaved dimensions."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
