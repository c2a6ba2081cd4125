"""Bloom-filter equality-skipping probe: what does a per-bucket Bloom
buy a point lookup on a NON-pk, bucket-uncorrelated column — the case
where min/max stats are provably blind (every bucket spans the whole
domain)?

Table: n rows, 256 buckets, `tag` = a high-cardinality uniform string
(one distinct value per ~2 rows). Lookup: `tag = <planted value>`
(2 matching rows in one bucket), best-of-3, vs the full-scan filter.
Also reported: bloom build overhead on the init, manifest growth, and
the false-positive bucket count for 200 random absent values
(expected ~0 at m=8192/k=6 with ~n/256/2 distinct per bucket... the
honest number is printed, not assumed).

Usage: python tools/bloom_probe.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(f, n=3):
    times = []
    for _ in range(n):
        t0 = time.time()
        out = f()
        times.append(time.time() - t0)
    return min(times), out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    import json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        bloom_prune_buckets,
        read_versioned_table,
        write_versioned_table,
        _bloom_lookup_hashes,
        _bucket_manifest,
    )

    spark = get_spark("bloom_probe", cpus=32)
    d = tempfile.mkdtemp(prefix="bloom_probe_")
    path = os.path.join(d, "t")
    try:
        df = spark.range(n).select(
            F.concat(F.lit("k"), F.col("id")).alias("Id"),
            F.concat(F.lit("tag"), (F.col("id") / 2).cast("long")).alias(
                "tag"
            ),
            F.col("id").alias("v"),
        )
        t0 = time.time()
        write_versioned_table(df, path, "Id", 256)
        t_plain = time.time() - t0
        shutil.rmtree(path)
        t0 = time.time()
        write_versioned_table(df, path, "Id", 256, bloom_cols=["tag"])
        t_bloom = time.time() - t0
        mf = _bucket_manifest(path)
        msize = len(json.dumps(mf))
        gen0 = next(iter(mf["buckets"].values()))
        bsize = os.path.getsize(os.path.join(path, gen0, "_bloom-tag.json"))
        target = f"tag{n // 4}"

        t_eq, got = best_of(
            lambda: read_versioned_table(
                spark, path, eq=[("tag", target)]
            ).count()
        )
        t_full, got_f = best_of(
            lambda: read_versioned_table(spark, path)
            .where(F.col("tag") == target)
            .count()
        )
        assert got == got_f == 2, (got, got_f)
        # false-positive rate on absent values: extra buckets read
        fp = 0
        for i in range(200):
            h1, h2 = _bloom_lookup_hashes(spark, mf, "tag", f"absent-{i}")
            fp += len(bloom_prune_buckets(path, mf, "tag", h1, h2))
        print(
            f"n={n}, 256 buckets: eq lookup {t_eq:.2f}s vs full-scan "
            f"filter {t_full:.2f}s ({t_full / t_eq:.1f}x); bloom build "
            f"overhead {t_bloom - t_plain:.1f}s on init ({t_plain:.1f}s -> "
            f"{t_bloom:.1f}s); manifest {msize / 1024:.0f} KiB + sidecar {bsize / 1048576:.1f} MiB; "
            f"false-positive buckets over 200 absent lookups: {fp} "
            f"({fp / 200 / 256:.5f} per bucket-lookup)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
