#!/usr/bin/env python3
"""Phase profiler for the streaming protocol-floor operators (r18).

Monkeypatches the batch-side helpers the admit family calls, and
StreamingQuery.stop (to harvest recentProgress before the query dies),
then runs the named operators and prints a per-phase wall-time table
plus per-microbatch durationMs breakdowns. Measurement tooling only —
never on the bench path.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_stream.py <name> [...] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PHASES: list[tuple[str, float]] = []
PROGRESS: list[dict] = []


def _timed(fn, label):
    def w(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        PHASES.append((label, time.perf_counter() - t0))
        return r

    return w


def main() -> int:
    args = sys.argv[1:]
    runs = 1
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    import json

    from pyspark.sql.streaming import StreamingQuery

    import kinesumer_spark.operators.dedup as D
    import kinesumer_spark.streaming.queries as Q
    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    # harvest per-microbatch progress from EVERY streaming query at stop
    _orig_stop = StreamingQuery.stop

    def stop(self):
        try:
            for p in self.recentProgress:
                PROGRESS.append(p if isinstance(p, dict) else json.loads(p.json))
        except Exception:
            pass
        return _orig_stop(self)

    StreamingQuery.stop = stop

    for mod, fname in (
        (Q, "_admit_chunk_bounds"),
        (Q, "_write_admit_chunks"),
        (Q, "_admit_verdict"),
        (Q, "_assert_admit_ttl_state_carried"),
        (Q, "_assert_semadmit_state_carried"),
        (D, "stream_inrow_band_probe"),
        (D, "minhash_band_keys"),
        (D, "shingle_sets"),
        (D, "_shingles_raw"),
    ):
        if hasattr(mod, fname):
            setattr(mod, fname, _timed(getattr(mod, fname), fname))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_stream")
    registry = all_queries()
    try:
        registry["q6_forecast_revenue"].spark(spark, sf_dir).collect()
    except Exception:
        pass

    for name in names:
        if name not in registry:
            print(f"{name}: NOT REGISTERED")
            continue
        for r in range(runs):
            PHASES.clear()
            PROGRESS.clear()
            t0 = time.perf_counter()
            registry[name].spark(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            lazy_built = sum(d for _, d in PHASES)
            print(f"\n=== {name} run {r + 1}: wall {wall:.2f}s "
                  f"(instrumented build-phases {lazy_built:.2f}s) ===")
            for label, d in PHASES:
                print(f"  phase {label:34s} {d:7.3f}s")
            n_rows = sum(p.get("numInputRows", 0) for p in PROGRESS)
            print(f"  {len(PROGRESS)} microbatches, {n_rows} input rows")
            keys = (
                "addBatch", "getBatch", "latestOffset", "queryPlanning",
                "triggerExecution", "walCommit", "commitOffsets",
            )
            tot = {k: 0.0 for k in keys}
            for p in PROGRESS:
                dm = p.get("durationMs", {})
                for k in keys:
                    tot[k] += dm.get(k, 0) / 1000.0
            for k in keys:
                if tot[k]:
                    print(f"  microbatch {k:24s} {tot[k]:7.3f}s total")
            so = [
                (
                    p.get("batchId"),
                    sum(s.get("commitTimeMs", 0) for s in p.get("stateOperators", [])) / 1000.0,
                    sum(s.get("numRowsUpdated", 0) for s in p.get("stateOperators", [])),
                )
                for p in PROGRESS
                if p.get("stateOperators")
            ]
            if so:
                print("  state commits (batchId, commit_s, rowsUpdated):", so)
            cm_tot: dict[str, float] = {}
            for p in PROGRESS:
                for s in p.get("stateOperators", []):
                    for k, val in (s.get("customMetrics") or {}).items():
                        cm_tot[k] = cm_tot.get(k, 0.0) + val
            interesting = {
                k: v
                for k, v in sorted(cm_tot.items(), key=lambda kv: -kv[1])
                if v > 0 and ("Latency" in k or "TimeMs" in k or "Time" in k)
            }
            for k, v in list(interesting.items())[:14]:
                print(f"  stateMetric {k:46s} {v / 1000.0:9.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
