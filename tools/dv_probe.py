"""Deletion-vector write-amplification probe: the same 100-key
erasure on a 10M-row table, once copy-on-write (mode="rewrite") and
once merge-on-read (mode="dv"), measuring wall time and BYTES WRITTEN
under each commit's new generation — the number that decides the 100
TB strategy. Also verifies both modes read back identically and that
OPTIMIZE materializes the DV.

Usage: python tools/dv_probe.py [rows] [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("AMAXA_SPARK_DRIVER_MEM", "8g")
    from pyspark.sql import functions as F

    from amaxa_spark.session import get_spark
    from amaxa_spark.sources.catalog import (
        delete_from_versioned,
        optimize_versioned,
        read_versioned_table,
        write_versioned_table,
        _bucket_manifest,
    )

    spark = get_spark(
        "dv_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    tmp = tempfile.mkdtemp(prefix="dv_probe_")
    step = n_rows // n_keys

    out: dict = {"rows": n_rows, "n_keys": n_keys}
    roots = {}
    for mode in ("rewrite", "dv"):
        root = os.path.join(tmp, mode)
        roots[mode] = root
        df = spark.range(n_rows).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_versioned_table(df, root, "k", n_buckets=32)
        keys = spark.range(n_keys).select(
            (F.col("id") * step).alias("k")
        )
        gens_before = {
            e for e in os.listdir(root) if e.startswith("gen-")
        }
        t0 = time.time()
        delete_from_versioned(spark, root, keys, "k", mode=mode)
        wall = time.time() - t0
        new_gens = [
            e for e in os.listdir(root)
            if e.startswith("gen-") and e not in gens_before
        ]
        written = sum(_tree_bytes(os.path.join(root, g)) for g in new_gens)
        n = read_versioned_table(spark, root).count()
        assert n == n_rows - n_keys, (mode, n)
        out[mode] = {
            "delete_s": round(wall, 1),
            "bytes_written": written,
            "mb_written": round(written / 1e6, 2),
        }
    out["write_amplification_x"] = round(
        out["rewrite"]["bytes_written"] / max(out["dv"]["bytes_written"], 1),
        1,
    )

    # both modes agree row-for-row
    a = read_versioned_table(spark, roots["rewrite"]).select("k", "v")
    b = read_versioned_table(spark, roots["dv"]).select("k", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # OPTIMIZE materializes: dv'd buckets compact, dv map empties
    t0 = time.time()
    optimize_versioned(spark, roots["dv"], max_files=999)
    out["optimize_materialize_s"] = round(time.time() - t0, 1)
    assert not _bucket_manifest(roots["dv"]).get("dv")
    assert read_versioned_table(spark, roots["dv"]).count() == n_rows - n_keys
    out["modes_equal"] = True
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
