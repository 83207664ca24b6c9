#!/usr/bin/env python3
"""Pre-validate the driver's next 50-name window against DuckDB.

The external driver checks exactly the FIRST 50 names of
``__spark_entry__.queries()`` (registry.front_order over
driver_evidence.json: red/no-oracle first, then never-checked, then
oldest green). This tool replays that window locally with the
driver-faithful compare (sorted columns, sorted rows, string-compare of
equal-dtype frames) so a round never ships an unvalidated window.

Usage:
    python tools/validate_window.py [sf_dir] [n]

Defaults: sf_dir=/root/testdata/sf0.01 (the driver's gate SF), n=50.
Exit code 0 iff every window query is green. Queries without an oracle
entry get the driver's weaker rows-only check, flagged in the output.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

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
    names = list(qs)[:n]
    t0 = time.time()
    ok = 0
    bad: list[str] = []
    for name in names:
        try:
            sp = qs[name](spark, sf).toPandas()
            if name in osql:
                du = con.sql(osql[name]).df()
                cols = sorted(sp.columns)
                a = (
                    sp[cols]
                    .sort_values(cols)
                    .reset_index(drop=True)
                    .astype(str)
                )
                b = (
                    du[cols]
                    .sort_values(cols)
                    .reset_index(drop=True)
                    .astype(str)
                )
                good = a.equals(b)
                tag = ""
            else:
                good = len(sp) >= 0
                tag = " [rows-only]"
            ok += good
            if not good:
                bad.append(name)
            print(f"{'ok ' if good else 'RED'} {name}{tag}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report every query
            bad.append(name)
            print(f"ERR {name}: {str(exc)[:160]}", flush=True)
    print(
        f"\n{ok}/{len(names)} green in {time.time() - t0:.1f}s"
        + (f"; bad: {bad}" if bad else ""),
        flush=True,
    )
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
