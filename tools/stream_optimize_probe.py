"""Streaming auto-OPTIMIZE probe: measure what `merge_stream_writer(
optimize_every=N)` actually buys at steady state — file-count and
full-scan latency evolution over a run of micro-batches, WITH and
WITHOUT the periodic compaction.

Mechanics: bucket-scoped streaming MERGE appends ~one parquet file
per touched bucket per micro-batch, so an un-compacted table's file
count grows linearly with batches and every scan pays that many
open/footer costs. `optimize_every=N` folds each fragmented bucket
back to <= optimize_max_files files every Nth batch as its own
commit. The probe drives the sink's exact per-batch body
(`upsert_batch` + the Nth-batch `optimize_versioned` call — the same
two statements `merge_stream_writer._apply` executes) in a loop with
DETERMINISTIC batch contents, so the with/without runs see identical
data and the deltas are pure layout effects. (The Spark streaming
scheduler around that body is exercised end-to-end by
tests/test_beyond.py's CDC replication gate; scheduling adds no
files.)

Per sampled batch: live parquet file count (head manifest bucket
dirs) and a timed full scan (sum(v) over the head). One JSON line
per sample, a summary line per variant.

Usage: python tools/stream_optimize_probe.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark import get_spark
from amaxa_spark.sources.catalog import (
    MERGE_BUCKET_COL,
    ConcurrentMergeError,
    _bucket_manifest,
    optimize_versioned,
    read_versioned_table,
    write_versioned_table,
)
from amaxa_spark.streaming.merge_stream import upsert_batch

N_BUCKETS = 64
KEYSPACE = 200_000


def live_files(path: str) -> int:
    m = _bucket_manifest(path)
    n = 0
    for b, gen in m["buckets"].items():
        leaf = os.path.join(path, gen, f"{MERGE_BUCKET_COL}={b}")
        n += sum(
            1 for f in os.listdir(leaf)
            if f.endswith(".parquet") and not f.startswith(".")
        )
    return n


def timed_scan(spark, path: str) -> float:
    t0 = time.time()
    read_versioned_table(spark, path).agg(F.sum("v")).collect()
    return time.time() - t0


def run_variant(
    spark, n_batches: int, rows_per_batch: int,
    optimize_every: int | None, optimize_max_files: int = 4,
) -> dict:
    root = tempfile.mkdtemp(prefix="stream_opt_probe_")
    path = os.path.join(root, "t")
    base = spark.range(KEYSPACE).select(
        F.col("id").alias("pk"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(0).alias("ts"),
    )
    write_versioned_table(base, path, pk="pk", n_buckets=N_BUCKETS)
    samples = []
    t_batches = 0.0
    for i in range(n_batches):
        # deterministic batch: a striding window of keys, values
        # carry the batch id so last-write-wins is observable
        lo = (i * 17_117) % (KEYSPACE - rows_per_batch)
        batch = spark.range(lo, lo + rows_per_batch).select(
            F.col("id").alias("pk"),
            (F.col("id") + i * 1.0).alias("v"),
            F.lit(i + 1).alias("ts"),
        )
        t0 = time.time()
        # the sink body: upsert_batch + the Nth-batch compaction —
        # exactly merge_stream_writer._apply's two statements
        upsert_batch(
            spark, path, batch, "pk", ["v"], "ts", batch_id=i,
        )
        if (
            optimize_every
            and i % optimize_every == optimize_every - 1
        ):
            try:
                optimize_versioned(
                    spark, path, max_files=optimize_max_files
                )
            except ConcurrentMergeError:
                pass
        t_batches += time.time() - t0
        if i % 4 == 3 or i == n_batches - 1:
            samples.append({
                "batch": i + 1,
                "files": live_files(path),
                "scan_s": round(timed_scan(spark, path), 3),
            })
    return {
        "optimize_every": optimize_every,
        "batch_total_s": round(t_batches, 1),
        "final_files": samples[-1]["files"],
        "final_scan_s": samples[-1]["scan_s"],
        "samples": samples,
    }


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("stream_optimize_probe")
    without = run_variant(spark, n_batches, rows, None)
    with_opt = run_variant(spark, n_batches, rows, 8)
    print(json.dumps({"variant": "no_optimize", **without}))
    print(json.dumps({"variant": "optimize_every_8", **with_opt}))
    print(json.dumps({
        "files_ratio": round(
            without["final_files"] / max(with_opt["final_files"], 1), 1
        ),
        "scan_speedup": round(
            without["final_scan_s"] / max(with_opt["final_scan_s"], 1e-9), 2
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
