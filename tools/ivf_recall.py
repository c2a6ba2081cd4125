"""Measure IVF ANN recall@k against brute-force ground truth.

For each nprobe in a sweep, recall@k = |IVF top-k ∩ exact top-k| /
(k · n_queries) over a fixed deterministic query set — the quality
half of the IVF speed/quality trade (SCALE_NOTES "IVF recall curve").

Usage: python tools/ivf_recall.py [sf_dir] [k] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amaxa_spark.operators.similarity import cosine_topk, ivf_cosine_topk
from amaxa_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("ivf_recall")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    # deterministic spread of query ids across the corpus
    query_ids = [int(i * n / n_queries) for i in range(n_queries)]

    t0 = time.time()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_ids, k=k).collect()
    }
    t_exact = time.time() - t0
    print(f"corpus={n} queries={n_queries} k={k} exact={t_exact:.2f}s")
    print(f"{'nprobe':>6} {'recall@' + str(k):>10} {'sec':>7}")
    for nprobe in (1, 2, 4, 8):
        t0 = time.time()
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_cosine_topk(
                emb, query_ids, k=k, n_centroids=16, nprobe=nprobe
            ).collect()
        }
        dt = time.time() - t0
        recall = len(got & truth) / max(len(truth), 1)
        print(f"{nprobe:>6} {recall:>10.4f} {dt:>7.2f}")


if __name__ == "__main__":
    main()
