"""SemDeDup scale probe: does within-cluster pairing stay bounded
when K grows with the corpus (the paper's design point: clusters are
the scale lever), and what does the codebook+assignment pipeline cost
at fleet-ish vector counts?

Fixture: n synthetic unit-ish vectors (dim 64) in c planted "topics"
(vector = topic direction + small noise), plus a 1% planted layer of
near-identical copies — the duplicates SemDeDup exists to find.

Measured per (n, K): wall for the full semantic_dedup pass, the
candidate-pair volume (sum of per-cluster rank-pairs — what the
equi-join actually scores) vs the dead n²/2 frontier, the max cluster
size, and planted-dup recall (copies flagged as dup).

Usage: python tools/semdedup_probe.py [n_rows] [n_centroids] [impl]
(impl = 'pandas' default | 'hof' — the oracle-deterministic baseline)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    dim, topics = 64, 8000

    from pyspark.sql import functions as F

    from amaxa_spark.operators.dedup import semantic_dedup
    from amaxa_spark.session import get_spark

    spark = get_spark("semdedup_probe", cpus=32)
    # topic direction: md5-seeded pseudo-random per (topic, pos);
    # noise: per (vec, pos). Copies (1%) reuse their source's vector
    # with near-zero noise so cosine ≈ 1.
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % topics).alias("__t"),
        (F.col("id") % 100 == 99).alias("__copy"),
    )
    comp = [
        (
            F.sin((F.col("__t") + 1) * (p + 1) * 0.7331)
            + F.when(
                F.col("__copy"), F.lit(0.0)
            ).otherwise(F.sin((F.col("vec_id") + 1) * (p + 13) * 0.1327) * 0.8)
        ).alias(f"c{p}")
        for p in range(dim)
    ]
    emb = base.select(*([F.col("vec_id"), F.col("__copy")] + comp)).select(
        "vec_id",
        "__copy",
        F.array(*[F.col(f"c{p}") for p in range(dim)]).alias("embedding"),
    )
    emb = emb.localCheckpoint(eager=True)

    t0 = time.time()
    impl = sys.argv[3] if len(sys.argv) > 3 else "pandas"
    out = semantic_dedup(
        emb.select("vec_id", "embedding"),
        n_centroids=k,
        threshold=0.98,
        kmeans_iters=2,
        assign_impl=impl,
    ).localCheckpoint(eager=True)
    wall = time.time() - t0
    sizes = out.groupBy("cid").count()
    stats = sizes.agg(
        F.max("count").alias("mx"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
    ).collect()[0]
    flagged = out.where("dup").count()
    copies = emb.where("__copy").join(out.where("dup"), "vec_id", "left_semi")
    recall = copies.count() / emb.where("__copy").count()
    print(
        f"n={n} K={k} impl={impl}: semantic_dedup {wall:.1f}s; max cluster "
        f"{stats['mx']} (E[n/K]={n // k}); candidate pairs "
        f"{int(stats['pairs']):,} vs n^2/2 frontier {n * (n - 1) // 2:,} "
        f"({n * (n - 1) / 2 / max(stats['pairs'], 1):.0f}x reduction); "
        f"{flagged:,} flagged, planted-copy recall {recall:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
