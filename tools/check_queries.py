#!/usr/bin/env python3
"""Validate SPECIFIC named registry queries against their DuckDB oracles
with the driver-faithful compare (same discipline as validate_window,
which only covers the first-N window).

Usage:
    python tools/check_queries.py name1 [name2 ...] [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args

    import duckdb

    import __spark_entry__ as entry
    from kinesumer_spark.catalog import TABLES
    from kinesumer_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf}/{t}.parquet')"
        )
    spark = get_spark()
    qs, osql = entry.queries(), entry.oracle_sql()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sp = qs[name](spark, sf).toPandas()
            if name not in osql:
                print(f"{name}: ROWS-ONLY rows={len(sp)} ({time.time()-t0:.1f}s)")
                continue
            du = con.sql(osql[name]).df()
            cols = sorted(sp.columns)
            ocols = sorted(du.columns)
            if cols != ocols:
                bad.append(name)
                print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
                continue
            a = sp[cols].sort_values(cols).reset_index(drop=True).astype(str)
            b = du[cols].sort_values(cols).reset_index(drop=True).astype(str)
            if len(a) != len(b):
                bad.append(name)
                print(f"{name}: ROWS {len(a)} vs {len(b)}")
            elif not a.equals(b):
                bad.append(name)
                diff = (a != b).any(axis=1)
                print(f"{name}: VALUE MISMATCH ({int(diff.sum())} rows)")
                print("spark:", a[diff].head(3).to_dict("records"))
                print("oracle:", b[diff].head(3).to_dict("records"))
            else:
                print(
                    f"{name}: OK rows={len(a)} ({time.time()-t0:.1f}s)"
                )
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
