#!/usr/bin/env python3
"""Time registered queries under an explicit SparkSession conf overlay.

Usage:
    python tools/measure_conf.py --conf k=v [--conf k=v ...] \
        [--runs N] name1 name2 ...

Builds ONE session with the overlay (get_spark extra_conf) and times each
query with min-of-N collect() (bench methodology). Because conf overlays
need a fresh JVM, run the baseline and the overlay as two separate
invocations back-to-back; pair the outputs externally.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    runs = 3
    conf: dict[str, str] = {}
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            conf[k] = v
            i += 2
        else:
            names.append(args[i])
            i += 1

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_conf", extra_conf=conf or None)
    for k, v in conf.items():
        print(f"CONF {k}={spark.conf.get(k, '<unset>')} (asked {v})")
    registry = all_queries()
    try:
        registry["q6_forecast_revenue"].spark(spark, sf_dir).collect()
    except Exception:
        pass
    total = 0.0
    for name in names:
        if name not in registry:
            print(f"{name}: NOT REGISTERED")
            continue
        best = float("inf")
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"conf:{name}")
            df.collect()
            spark.sparkContext.setJobDescription(None)
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        total += best
        print(f"{name}: min={best:.4f}s runs={times}")
    print(f"TOTAL(min): {total:.4f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
