"""UPDATE write-amplification probe — the dv_probe.py sibling for the
round-11 merge-on-read UPDATE: the same 100-key reprice on a 10M-row
table, once copy-on-write (mode="rewrite") and once merge-on-read
(mode="dv", DV + UPDATE overlay sidecars), measuring wall time and
BYTES WRITTEN under each commit's new generations. Also verifies both
modes read back identically and that OPTIMIZE materializes the
overlay back to pure files.

Usage: python tools/dv_update_probe.py [rows] [n_keys]
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
        optimize_versioned,
        read_versioned_table,
        update_versioned,
        write_versioned_table,
        _bucket_manifest,
    )

    spark = get_spark(
        "dv_update_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    )
    tmp = tempfile.mkdtemp(prefix="dv_update_probe_")
    step = n_rows // n_keys
    where = f"k % {step} = 0"

    out: dict = {"rows": n_rows, "n_keys": n_keys}
    roots = {}
    for mode in ("rewrite", "dv"):
        root = os.path.join(tmp, mode)
        roots[mode] = root
        df = spark.range(n_rows).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
        write_versioned_table(df, root, "k", n_buckets=32)
        gens_before = {
            e for e in os.listdir(root) if e.startswith("gen-")
        }
        t0 = time.time()
        update_versioned(
            spark, root, {"v": "v * 10 + 1"}, where=where, mode=mode
        )
        wall = time.time() - t0
        new_gens = [
            e for e in os.listdir(root)
            if e.startswith("gen-") and e not in gens_before
        ]
        written = sum(_tree_bytes(os.path.join(root, g)) for g in new_gens)
        r = read_versioned_table(spark, root)
        n = r.count()
        assert n == n_rows, (mode, n)
        hits = r.where(where).agg(
            F.count(F.lit(1)),
            F.sum((F.col("v") != F.col("k") * 10.0 + 1).cast("int")),
        ).first()
        assert hits[0] == n_keys and (hits[1] or 0) == 0, (mode, hits)
        out[mode] = {
            "update_s": round(wall, 1),
            "bytes_written": written,
            "mb_written": round(written / 1e6, 2),
        }
    out["write_amplification_ratio"] = round(
        out["rewrite"]["bytes_written"] / out["dv"]["bytes_written"], 1
    )

    # the two modes must be row-identical
    a = read_versioned_table(spark, roots["rewrite"]).select("k", "v")
    b = read_versioned_table(spark, roots["dv"]).select("k", "v")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    out["modes_identical"] = True

    # OPTIMIZE materializes the overlay back to pure files
    t0 = time.time()
    optimize_versioned(spark, roots["dv"])
    out["optimize_s"] = round(time.time() - t0, 1)
    m = _bucket_manifest(roots["dv"])
    assert not m.get("dv") and not m.get("patch")
    b2 = read_versioned_table(spark, roots["dv"]).select("k", "v")
    assert a.exceptAll(b2).isEmpty() and b2.exceptAll(a).isEmpty()
    out["optimize_materializes"] = True

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
