#!/usr/bin/env python3
"""Isolated per-query timing via the noop sink (guide §1.4).

Usage:
    python tools/measure_ab.py <name> [<name> ...] [--runs N] [--collect]

Times each registered query with min-of-N over the noop sink (or
`.collect()` with --collect, matching bench methodology) and prints one
line per query. Jobs are labelled so the timing is attributable.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    use_collect = False
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--collect":
            use_collect = True
            i += 1
        else:
            names.append(args[i])
            i += 1

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="measure_ab")
    registry = all_queries()
    # warm the session once
    try:
        registry["q6_forecast_revenue"].spark(spark, sf_dir).collect()
    except Exception:
        pass
    for name in names:
        if name not in registry:
            print(f"{name}: NOT REGISTERED")
            continue
        best = float("inf")
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"ab:{name}")
            if use_collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: min={best:.4f}s runs={times}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
