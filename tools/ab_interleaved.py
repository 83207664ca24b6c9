#!/usr/bin/env python3
"""Interleaved A/B timing: SPARK_GRAFT_FANOUT=0 (A) vs auto (B).

The sandbox host's effective CPU speed drifts minute-to-minute (steal),
so A-then-B blocks are unreliable; this alternates A,B,A,B,... rebuilds
within one session and reports per-arm minima. Collect-action timing to
match bench methodology.

Usage: python tools/ab_interleaved.py <name> [...] [--pairs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    pairs = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--pairs":
            pairs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_interleaved")
    registry = all_queries()
    try:
        registry["q6_forecast_revenue"].spark(spark, sf_dir).collect()
    except Exception:
        pass
    for name in names:
        if name not in registry:
            print(f"{name}: NOT REGISTERED")
            continue
        runs = {"off": [], "auto": []}
        # one untimed warm build+run per arm so JIT/codegen cache warmth
        # is symmetric before timing starts
        for arm in ("off", "auto"):
            os.environ["SPARK_GRAFT_FANOUT"] = "0" if arm == "off" else "auto"
            try:
                registry[name].spark(spark, sf_dir).collect()
            except Exception as exc:
                print(f"{name}[{arm}] warm FAILED: {exc}")
        for _ in range(pairs):
            for arm in ("off", "auto"):
                os.environ["SPARK_GRAFT_FANOUT"] = "0" if arm == "off" else "auto"
                t0 = time.perf_counter()
                registry[name].spark(spark, sf_dir).collect()
                runs[arm].append(round(time.perf_counter() - t0, 3))
        os.environ["SPARK_GRAFT_FANOUT"] = "auto"
        a, b = min(runs["off"]), min(runs["auto"])
        print(
            f"{name}: off_min={a:.3f} auto_min={b:.3f} "
            f"ratio={a / b:.2f}x  off={runs['off']} auto={runs['auto']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
