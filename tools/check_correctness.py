"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` twin (DuckDB) at the given sf dir; compares row
count, sorted column names, and an order-insensitive value hash
(columns sorted by name, floats rounded, rows sorted, md5).

Usage: python tools/check_correctness.py [--stream] [sf_dir] [query ...]

``--stream`` switches to the constant-memory comparison for large
scale factors (the sf>=1 path): instead of materializing and sorting
both result sets, rows stream through a COMMUTATIVE hash — per-row
md5 summed mod 2^127 — so multiset equality is checked with O(chunk)
memory on both engines (Spark ``toLocalIterator``, DuckDB
``fetchmany``). Canonicalization (float rounding, null/bool forms) is
byte-identical to the sorted path.
"""

from __future__ import annotations

import decimal
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


def _canon_val(v) -> str:
    # DECIMAL results (DuckDB parses `50.0` literals as DECIMAL, and
    # fetchmany hands back decimal.Decimal) must canonicalize exactly
    # like floats — "250.0" vs "250.000000" is not a real mismatch.
    # (The pandas path usually coerces DECIMAL columns to float64,
    # which is why only the streaming comparison ever saw them.)
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return ""
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (float, decimal.Decimal)):
        return f"{round(float(v), 6):.6f}"
    return str(v)


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append("\x01".join(_canon_val(v) for v in row))
    rows.sort()
    h = hashlib.md5("\x02".join(rows).encode()).hexdigest()
    return len(rows), sorted(df.columns), h


_MOD = (1 << 127) - 1  # Mersenne-ish modulus; sum of row hashes mod this


def _canon_row(vals) -> str:
    return "\x01".join(_canon_val(v) for v in vals)


def canon_stream(row_iter, cols: list[str]):
    """(count, sorted cols, commutative hash) without holding rows.
    Columns are value-reordered to sorted(cols) per row so both engines
    canonicalize identically regardless of projection order."""
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    total = 0
    n = 0
    for row in row_iter:
        vals = [row[i] for i in order]
        h = int.from_bytes(
            hashlib.md5(_canon_row(vals).encode()).digest(), "big"
        )
        total = (total + h) % _MOD
        n += 1
    return n, sorted(c.lower() for c in cols), f"{total:032x}"


def _spark_rows(df):
    # toLocalIterator streams one partition at a time to the driver
    for row in df.toLocalIterator():
        yield tuple(row)


def _duck_rows(cur, chunk: int = 8192):
    while True:
        batch = cur.fetchmany(chunk)
        if not batch:
            return
        yield from batch


def main():
    argv = [a for a in sys.argv[1:]]
    stream = "--stream" in argv
    if stream:
        argv.remove("--stream")
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}
    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table = a DIRECTORY of part files (e.g.
            # tools/sf1_bench.py's /tmp tables); glob for DuckDB
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf_df = fn(spark, sf_dir)
            if stream:
                sc, scols, sh = canon_stream(
                    _spark_rows(sdf_df), list(sdf_df.columns)
                )
            else:
                sdf = sdf_df.toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            report[name] = {"status": "fail", "err": str(e).splitlines()[0][:200]}
            n_bad += 1
            continue
        if name not in oracles:
            nrows = sc if stream else len(sdf)
            print(f"WEAK  {name}: rows={nrows} (no oracle) [{time.time()-t0:.1f}s]")
            report[name] = {"status": "weak_no_oracle", "rows": int(nrows)}
            n_weak += 1
            continue
        try:
            if stream:
                cur = con.execute(oracles[name])
                ocols_raw = [d[0] for d in cur.description]
                oc, ocols, oh = canon_stream(_duck_rows(cur), ocols_raw)
            else:
                odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {str(e).splitlines()[0][:160]}")
            report[name] = {"status": "fail", "err": "oracle: " + str(e).splitlines()[0][:200]}
            n_bad += 1
            continue
        if not stream:
            sc, scols, sh = canon(sdf)
            oc, ocols, oh = canon(odf)
        if scols != ocols:
            print(f"FAIL  {name}: columns spark={scols} oracle={ocols}")
            report[name] = {"status": "fail", "err": f"columns spark={scols} oracle={ocols}"}
            n_bad += 1
        elif sc != oc:
            print(f"FAIL  {name}: rows spark={sc} oracle={oc}")
            report[name] = {"status": "fail", "err": f"rows spark={sc} oracle={oc}"}
            n_bad += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash mismatch (rows={sc})")
            report[name] = {"status": "fail", "err": f"value hash mismatch (rows={sc})"}
            n_bad += 1
        else:
            print(f"OK    {name}: rows={sc} [{time.time()-t0:.1f}s]")
            report[name] = {
                "status": "ok", "rows": int(sc),
                "rows_match": True, "schema_match": True, "hash_match": True,
            }
            n_ok += 1
    print(f"\n{n_ok} ok, {n_weak} weak (no oracle), {n_bad} failed")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_ok": n_ok,
                    "n_weak_no_oracle": n_weak,
                    "n_failed": n_bad,
                    "queries": report,
                },
                f,
                indent=1,
            )
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
