"""Local emulation of the driver's correctness gate.

Runs every query in the registry at a given SF, runs its DuckDB oracle
on the same parquet tables, and compares row count, column names, and
an order-insensitive value hash. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def norm_cell(v):
    if v is None or v != v:  # None/NaN
        return "\\N"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v))
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    rows = ["\x1f".join(norm_cell(v) for v in rec) for rec in pdf[cols].itertuples(index=False)]
    rows.sort()
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json-out" in args:
        i = args.index("--json-out")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from python_plugins_spark import get_spark
    from python_plugins_spark.queries import ORACLES, QUERIES

    spark = get_spark("correctness")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    failures = []
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            results[name] = {"rows": None, "ok": False, "err": "spark_error"}
            continue
        if name not in ORACLES:
            print(f"weak  {name}: rows={len(spark_pdf)} (no oracle) [{time.time()-t0:.1f}s]")
            results[name] = {
                "rows": len(spark_pdf), "ok": True, "err": "no_oracle",
            }
            continue
        try:
            oracle_pdf = con.sql(ORACLES[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            failures.append(name)
            results[name] = {
                "rows": len(spark_pdf), "ok": False, "err": "oracle_error",
            }
            continue
        problems = []
        if len(spark_pdf) != len(oracle_pdf):
            problems.append(f"rows {len(spark_pdf)} vs {len(oracle_pdf)}")
        if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
            problems.append(f"cols {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}")
        elif frame_hash(spark_pdf) != frame_hash(oracle_pdf):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            failures.append(name)
            results[name] = {
                "rows": len(spark_pdf), "ok": False,
                "err": "; ".join(problems)[:160],
            }
            # show a small diff sample
            try:
                cols = sorted(spark_pdf.columns)
                s = set(
                    "\x1f".join(norm_cell(v) for v in r)
                    for r in spark_pdf[cols].itertuples(index=False)
                )
                o = set(
                    "\x1f".join(norm_cell(v) for v in r)
                    for r in oracle_pdf[cols].itertuples(index=False)
                )
                print("   spark-only:", list(s - o)[:3])
                print("   oracle-only:", list(o - s)[:3])
            except Exception:
                pass
        else:
            empty = " EMPTY-RESULT (vacuous match!)" if len(spark_pdf) == 0 else ""
            print(f"ok    {name}: rows={len(spark_pdf)}{empty} [{time.time()-t0:.1f}s]")
            results[name] = {"rows": len(spark_pdf), "ok": True, "err": None}

    if json_out:
        # the committed per-query evidence artifact (VERDICT r8 ask #6):
        # every query's row count + verdict, diffable across rounds
        import json

        with open(json_out, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "queries": results},
                fh, indent=1, sort_keys=True,
            )
        print(f"wrote {json_out} ({len(results)} queries)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
