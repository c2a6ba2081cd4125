"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` twin (DuckDB) at the given sf dir; compares row
count, sorted column names, and an order-insensitive value hash
(columns sorted by name, floats rounded, rows sorted, md5).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from amaxa_spark.session import get_spark
from amaxa_spark.tpch import TABLES


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                vals.append("")
            elif isinstance(v, float):
                vals.append(f"{round(v, 6):.6f}")
            elif isinstance(v, bool):
                vals.append("T" if v else "F")
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    rows.sort()
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(rows), sorted(df.columns), h


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:160]}")
            n_bad += 1
            continue
        sc, scols, sh = canon(sdf)
        oc, ocols, oh = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            n_bad += 1
        elif sc != oc:
            print(f"FAIL  {name}: rows spark={sc} oracle={oc}")
            n_bad += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash mismatch (rows={sc})")
            # show a diff sample
            s_set = set(map(tuple, sdf[sorted(sdf.columns.str.lower())].head(0).itertuples(index=False)))
            n_bad += 1
        else:
            print(f"OK    {name}: rows={sc} [{time.time()-t0:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_weak} weak (no oracle), {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
