#!/usr/bin/env python3
"""Interleaved A/B timing between two env-var arms.

Default experiment: SPARK_GRAFT_FANOUT=0 (A) vs auto (B). Any other
env-gated change can be A/B'd with --envvar/--arms, e.g.:

    python tools/ab_interleaved.py q5_local_supplier_volume \
        --envvar SPARK_GRAFT_PREFER_SMJ --arms true,false --pairs 4

The sandbox host's effective CPU speed drifts minute-to-minute (steal),
so A-then-B blocks are unreliable; this alternates A,B,A,B,... rebuilds
within one session and reports per-arm minima. Collect-action timing to
match bench methodology.

NOTE arms are applied via os.environ BEFORE each rebuild — they only
A/B code that reads the env var at DataFrame-build time (fan_out does;
session confs read at get_spark time do NOT — for those, pass
--conf spark.conf.key so the tool sets the session conf per arm).

Usage: python tools/ab_interleaved.py <name> [...] [--pairs N]
           [--envvar VAR] [--arms a,b] [--conf spark.conf.key]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    pairs = 3
    envvar = "SPARK_GRAFT_FANOUT"
    arms = ["0", "auto"]
    conf_key = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--pairs":
            pairs = int(args[i + 1])
            i += 2
        elif args[i] == "--envvar":
            envvar = args[i + 1]
            i += 2
        elif args[i] == "--arms":
            arms = args[i + 1].split(",")
            i += 2
        elif args[i] == "--conf":
            conf_key = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    assert len(arms) == 2, "exactly two arms"

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_interleaved")
    registry = all_queries()

    def set_arm(v: str) -> None:
        if conf_key:
            spark.conf.set(conf_key, v)
        else:
            os.environ[envvar] = v

    saved = spark.conf.get(conf_key, None) if conf_key else os.environ.get(envvar)
    try:
        registry["q6_forecast_revenue"].spark(spark, sf_dir).collect()
    except Exception:
        pass
    for name in names:
        if name not in registry:
            print(f"{name}: NOT REGISTERED")
            continue
        runs: dict[str, list[float]] = {a: [] for a in arms}
        # one untimed warm build+run per arm so JIT/codegen cache warmth
        # is symmetric before timing starts
        for arm in arms:
            set_arm(arm)
            try:
                registry[name].spark(spark, sf_dir).collect()
            except Exception as exc:
                print(f"{name}[{arm}] warm FAILED: {exc}")
        for _ in range(pairs):
            for arm in arms:
                set_arm(arm)
                t0 = time.perf_counter()
                registry[name].spark(spark, sf_dir).collect()
                runs[arm].append(round(time.perf_counter() - t0, 3))
        a, b = min(runs[arms[0]]), min(runs[arms[1]])
        label = conf_key or envvar
        print(
            f"{name} [{label}]: {arms[0]}_min={a:.3f} {arms[1]}_min={b:.3f} "
            f"ratio={a / b:.2f}x  {arms[0]}={runs[arms[0]]} {arms[1]}={runs[arms[1]]}"
        )
    if conf_key:
        if saved is not None:
            spark.conf.set(conf_key, saved)
    elif saved is not None:
        os.environ[envvar] = saved
    else:
        os.environ.pop(envvar, None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
