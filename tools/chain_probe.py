"""Commit-chain metadata cost at 100 TB bucket counts — the probe for
the round-11 scale item: full-manifest-per-commit vs delta commits +
checkpoint folding.

Pure metadata: drives `_claim_commit` / `_commit_chain_head` /
`compact_commit_chain` with synthetic manifests at 10k and 100k
buckets (the manifest shape of a 100 TB table at ~1-10 GB/bucket), the
workload shape of a streaming sink (one 2-bucket MERGE commit per
micro-batch). No SparkSession — this isolates exactly the layer the
round-10 verdict flagged as O(#buckets) per commit.

Measures, per bucket count:
  - full commit JSON size vs delta commit size (and the ratio),
  - p50 claim latency (encode + write + link) full vs delta,
  - head-read latency right after a checkpoint vs at maximum delta lag
    (CHECKPOINT_EVERY-1 patches to replay),
  - chain file count and bytes before/after `compact_commit_chain`,
    and the fold's own wall time.

Usage: python tools/chain_probe.py [n_commits_per_tier]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amaxa_spark.sources import catalog as C  # noqa: E402


def synth_manifest(n_buckets: int) -> dict:
    gen = f"gen-{uuid.uuid4().hex[:12]}"
    return {
        "kind": "versioned-buckets",
        "pk": "pk",
        "n_buckets": n_buckets,
        "token": uuid.uuid4().hex[:12],
        "seq": 0,
        "buckets": {str(b): gen for b in range(n_buckets)},
        "stats_cols": ["pk"],
        "bucket_stats": {
            str(b): {
                "rows": 1000,
                "cols": {"pk": {"min": b, "max": b + 999, "nulls": 0}},
            }
            for b in range(n_buckets)
        },
    }


def next_commit(manifest: dict, touched: int = 2) -> dict:
    """One streaming micro-batch MERGE: rewrite `touched` buckets."""
    gen = f"gen-{uuid.uuid4().hex[:12]}"
    new = {
        **manifest,
        "token": uuid.uuid4().hex[:12],
        "seq": manifest["seq"] + 1,
        "buckets": dict(manifest["buckets"]),
        "bucket_stats": dict(manifest["bucket_stats"]),
    }
    for i in range(touched):
        b = str((new["seq"] * 7 + i) % manifest["n_buckets"])
        new["buckets"][b] = gen
        new["bucket_stats"][b] = {
            "rows": 1001,
            "cols": {"pk": {"min": 0, "max": 2000, "nulls": 0}},
        }
    return new


def chain_bytes(path: str) -> tuple[int, int]:
    cdir = os.path.join(path, C.COMMITS_DIR)
    files = [f for f in os.listdir(cdir) if f.endswith(".json")]
    return len(files), sum(
        os.path.getsize(os.path.join(cdir, f)) for f in files
    )


def tier(n_buckets: int, n_commits: int) -> dict:
    path = tempfile.mkdtemp(prefix=f"chain_probe_{n_buckets}_")
    manifest = synth_manifest(n_buckets)
    C._claim_commit(path, 0, manifest)

    full_sizes = [os.path.getsize(C._commit_path(path, 0))]
    delta_sizes = []
    claim_full, claim_delta = [], []
    for _ in range(n_commits):
        new = next_commit(manifest)
        t0 = time.perf_counter()
        C._claim_commit(path, new["seq"], new, parent=manifest)
        dt = time.perf_counter() - t0
        size = os.path.getsize(C._commit_path(path, new["seq"]))
        if new["seq"] % C.CHECKPOINT_EVERY == 0:
            full_sizes.append(size)
            claim_full.append(dt)
        else:
            delta_sizes.append(size)
            claim_delta.append(dt)
        manifest = new

    # head read at max delta lag (just before a checkpoint) vs the
    # current lag — measure both by replaying repeatedly
    def head_ms(reps: int = 20) -> float:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            seq, head = C._commit_chain_head(path)
            ts.append(time.perf_counter() - t0)
        assert head == manifest
        return statistics.median(ts) * 1000

    head_before_fold = head_ms()
    files_before, bytes_before = chain_bytes(path)
    t0 = time.perf_counter()
    res = C.compact_commit_chain(path, keep_last=C.CHECKPOINT_EVERY)
    fold_s = time.perf_counter() - t0
    files_after, bytes_after = chain_bytes(path)
    head_after_fold = head_ms()
    shutil.rmtree(path, ignore_errors=True)
    med = lambda xs: statistics.median(xs) if xs else None
    return {
        "n_buckets": n_buckets,
        "commits": n_commits,
        "full_commit_bytes": med(full_sizes),
        "delta_commit_bytes": med(delta_sizes),
        "delta_vs_full": round(med(full_sizes) / med(delta_sizes), 1)
        if full_sizes and delta_sizes
        else None,
        "claim_ms_full_p50": round(med(claim_full) * 1000, 2)
        if claim_full
        else None,
        "claim_ms_delta_p50": round(med(claim_delta) * 1000, 2),
        "head_read_ms_p50": round(head_before_fold, 2),
        "head_read_ms_after_fold": round(head_after_fold, 2),
        "chain_files_before_fold": files_before,
        "chain_files_after_fold": files_after,
        "chain_mb_before_fold": round(bytes_before / 1e6, 2),
        "chain_mb_after_fold": round(bytes_after / 1e6, 2),
        "fold_s": round(fold_s, 3),
        "folded_at": res["folded_at"],
    }


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out = [tier(nb, n_commits) for nb in (1_000, 10_000, 100_000)]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
