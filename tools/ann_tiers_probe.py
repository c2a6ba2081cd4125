"""ANN memory-tier comparison at scale: exact float scan vs int8
reconstruct vs PQ/ADC vs binary sign codes, one synthetic corpus,
same queries — the table that justifies which tier a 100 TB index
lives in. Measures wall (best of 2 after warm), top-1 and top-5
recall vs the exact ranking, and states each tier's bytes/vector.

Corpus: N iid gaussian 64-dim vectors (seeded, generated in-plan
from md5-derived uniforms — no driver-side data generation).

Usage: python tools/ann_tiers_probe.py [n_vectors]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.operators import similarity as SIM

DIM = 64
QIDS = list(range(8))
K = 5


def synth(spark, n):
    # Box-Muller over two md5-derived uniforms per (id, dim) — fully
    # in-plan, deterministic, no Python
    base = spark.range(n).select(F.col("id").alias("vec_id"))
    dims = F.array(*[
        F.sqrt(
            -2.0 * F.log(
                (F.conv(F.substring(F.md5(F.format_string(f"u{d}:%d", "vec_id")), 1, 6), 16, 10)
                 .cast("double") + 1.0) / 16777217.0
            )
        )
        * F.cos(
            2.0 * math.pi
            * (F.conv(F.substring(F.md5(F.format_string(f"v{d}:%d", "vec_id")), 1, 6), 16, 10)
               .cast("double") / 16777216.0)
        )
        for d in range(DIM)
    ])
    return base.select("vec_id", dims.alias("embedding"))


def timed(fn, reps=2):
    rows, best = None, None
    for _ in range(reps):
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return rows, round(best, 2)


def recall(got_rows, exact_top, k):
    hits = tot = 0
    got = {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    for q, ex in exact_top.items():
        hits += len(got.get(q, set()) & set(ex[:k]))
        tot += k
    return round(hits / tot, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("ann_tiers_probe")
    emb = synth(spark, n).localCheckpoint(eager=True)

    out = {"n_vectors": n, "dim": DIM, "k": K, "queries": len(QIDS)}

    ex_rows, ex_wall = timed(
        lambda: SIM.cosine_topk(emb, query_ids=QIDS, k=K)
    )
    exact_top = {}
    for r in sorted(ex_rows, key=lambda r: (r.query_id, r.rank)):
        exact_top.setdefault(r.query_id, []).append(r.neighbor_id)
    out["exact"] = {"wall_s": ex_wall, "bytes_per_vec": DIM * 4}

    q_rows, q_wall = timed(
        lambda: SIM.quantized_cosine_topk(emb, query_ids=QIDS, k=K)
    )
    out["int8"] = {
        "wall_s": q_wall, "bytes_per_vec": DIM,
        "recall@1": recall(q_rows, exact_top, 1),
        "recall@5": recall(q_rows, exact_top, K),
    }

    p_rows, p_wall = timed(
        lambda: SIM.pq_topk_adc(
            emb, query_ids=QIDS, dim=DIM, k_top=K, m=8, k=16, iters=3,
            oversample=4,
        ),
        reps=1,  # trains the codebook each run — one timed pass
    )
    out["pq_adc_rerank"] = {
        "wall_s": p_wall, "bytes_per_vec": 8 * 1,  # m=8 codes, 4 bits each -> 4B; 8B conservative w/ alignment
        "recall@1": recall(p_rows, exact_top, 1),
        "recall@5": recall(p_rows, exact_top, K),
    }

    b_rows, b_wall = timed(
        lambda: SIM.binary_cosine_topk(
            emb, query_ids=QIDS, dim=DIM, k=K, oversample=8
        )
    )
    out["binary"] = {
        "wall_s": b_wall, "bytes_per_vec": 8,
        "recall@1": recall(b_rows, exact_top, 1),
        "recall@5": recall(b_rows, exact_top, K),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
