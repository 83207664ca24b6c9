#!/usr/bin/env python3
"""Capture .explain("formatted") for registered queries into plans/r{N}/.

Usage:
    python tools/capture_plans.py <outdir-suffix> <before|after> [--executed] [name ...]

Writes plans/<outdir-suffix>/<name>_<tag>.txt for each query name (default:
the bench HEADLINE set). Without --executed this is a pure plan build —
nothing runs, safe next to a bench.

--executed (r17 verdict #4): runs each query ONCE (collect) and captures
the AQE FINAL plan from the SAME QueryExecution that ran. The r17 pitfall
this encodes: a noop-sink write executes its OWN QueryExecution, so
reading df.queryExecution.executedPlan afterwards shows the UNexecuted
isFinalPlan=false plan with zero ReusedExchange — runtime-reuse claims
must be read off the QueryExecution the action actually drove, which
collect() does. The capture appends a one-line summary (isFinalPlan /
ReusedExchange count) so tests and the judge can check reuse pins
without re-running Spark.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--executed"]
    executed = "--executed" in sys.argv[1:]
    outdir = argv[0] if len(argv) > 0 else "r17"
    tag = argv[1] if len(argv) > 1 else "before"
    names = argv[2:]

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
            if executed:
                # drive the df's OWN QueryExecution (see module docstring)
                df.collect()
                qe = df._jdf.queryExecution()
                jvm = spark.sparkContext._jvm
                mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                text = qe.explainString(mode)
                simple = qe.executedPlan().toString()
                n_reused = simple.count("ReusedExchange")
                is_final = "isFinalPlan=true" in text or "isFinalPlan=true" in simple
                text += (
                    f"\n== Executed-plan summary ==\n"
                    f"isFinalPlan_true_seen: {is_final}\n"
                    f"ReusedExchange_count: {n_reused}\n"
                )
            else:
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
