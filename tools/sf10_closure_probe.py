"""sf10 closure probe: the self-lookup fixpoint on a ~100M-node
parent-pointer forest (10x the largest prior probe) — the one operator
whose ROUND COUNT scales with graph depth, not data volume, so its
behavior at depth is the thing to measure, per round.

Synthesizes the forest TABLE-AT-A-TIME (one spark.range projection,
never a driver-side loop), runs the real ExtractOperation closure, and
reports: per-round wall + frontier size (captured from the operator's
own round telemetry), total wall, component size, and the memory
shape — JVM heap in use after the run and the driver process's peak
RSS. Appends nothing; print-only (SCALE_NOTES.md records the numbers).

Usage: python tools/sf10_closure_probe.py [n_rows]   (default 100M)
"""

from __future__ import annotations

import logging
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amaxa_spark.metadata import SchemaRegistry, TableMeta
from amaxa_spark.operators.extract import ExtractOperation
from amaxa_spark.plans.plan import ExtractScope, ExtractStepPlan
from amaxa_spark.session import get_spark
from amaxa_spark.sources.catalog import TableCatalog

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
TMP = "/tmp/amaxa_sf10_probe"


class _RoundCapture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.rounds: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("closure round"):
            self.rounds.append(msg)


def main() -> None:
    spark = get_spark("sf10_closure_probe")
    path = f"{TMP}/hier.parquet"
    if not os.path.exists(path):
        # binary forest: parent(id) = id // 2, roots are ids < 64 —
        # depth ~ log2(N); written table-at-a-time in one projection
        (
            spark.range(N)
            .select(
                F.col("id").alias("pk"),
                F.when(
                    F.col("id") >= 64, (F.col("id") / 2).cast("long")
                ).alias("parent"),
            )
            .repartition(256)
            .write.mode("overwrite")
            .parquet(path)
        )
    hier = spark.read.parquet(path)
    cat = TableCatalog(spark, TMP)
    cat.register("hier", hier)
    reg = SchemaRegistry(
        [TableMeta("hier", pk="pk", lookups={"parent": ["hier"]})]
    )

    cap = _RoundCapture()
    oplog = logging.getLogger("amaxa_spark.operators.extract")
    oplog.addHandler(cap)
    oplog.setLevel(logging.INFO)

    t0 = time.time()
    res = ExtractOperation(
        spark,
        cat,
        reg,
        [ExtractStepPlan("hier", ExtractScope.SELECTED_IDS, ids=[65])],
    ).run()
    n_rows = res["hier"].count()
    wall = time.time() - t0

    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    heap_used_gb = (rt.totalMemory() - rt.freeMemory()) / 1e9
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    print(f"n={N:,} depth~{N.bit_length()} component={n_rows:,} wall={wall:.1f}s")
    print(f"jvm_heap_used={heap_used_gb:.1f}GB driver_peak_rss={rss_gb:.1f}GB")
    print(f"rounds={len(cap.rounds)}")
    for msg in cap.rounds:
        print(" ", msg)


if __name__ == "__main__":
    main()
