#!/usr/bin/env python3
"""Capture .explain("formatted") for registered queries into plans/r{N}/.

Usage:
    python tools/capture_plans.py <outdir-suffix> <before|after> [name ...]

Writes plans/<outdir-suffix>/<name>_<tag>.txt for each query name (default:
the bench HEADLINE set). Pure plan build — nothing is executed, so this is
safe to run next to a bench (it costs driver time only).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "r17"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_capture")
    registry = all_queries()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in registry]

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        outdir,
    )
    os.makedirs(dst, exist_ok=True)
    rc = 0
    for name in names:
        if name not in registry:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = registry[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — capture what we can
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
            rc = 1
        path = os.path.join(dst, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} chars, Exchange x{n_ex} -> {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
