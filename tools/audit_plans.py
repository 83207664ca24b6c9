#!/usr/bin/env python3
"""Registry-wide physical-plan audit (r17, guide §7.2).

Builds .explain("formatted") for every registered BATCH query (streaming
ops execute eagerly on build, so they are skipped) and flags:

- duplicated Python-eval nodes: the same ArrowEvalPython/BatchEvalPython
  UDF expression appearing more than once in one plan (guide §4.4 — the
  filter-pushdown duplication class fixed for the ANN tiers this round);
- CartesianProduct / BroadcastNestedLoopJoin nodes (guide §3 — accidental
  non-equi joins), with a per-query allowlist for the validation ops that
  build exact all-pairs references BY DESIGN;
- Exchange count per plan (informational ranking).

Pure plan build — nothing is executed beyond the bounded model/codebook
pulls some operators do at DF-construction time.

Usage: python tools/audit_plans.py [--csv out.csv]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Validation/audit ops whose docstrings declare an exact all-pairs or
# theta-join reference (gate-scale by contract, never the scale path).
NONEQUI_OK = {
    "dedup_semantic",
    "similarity_ivf_probe",
    "similarity_dup_pairs_lsh",
    "dedup_ngram_jaccard",
    "similarity_tier_audit",
    "dedup_edit_distance",
    "events_asof_join",  # range condition rides the join by design
}


def main() -> int:
    import contextlib
    import io

    from kinesumer_spark.registry import all_queries
    from kinesumer_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_audit")
    registry = all_queries()

    rows = []
    for name, q in sorted(registry.items()):
        tags = set(getattr(q, "tags", ()) or ())
        if "streaming" in tags or name.startswith(("stream_", "pipeline_stream_")):
            continue
        try:
            df = q.spark(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — audit what we can
            rows.append((name, -1, 0, 0, f"BUILD FAILED: {type(exc).__name__}: {exc}"[:200]))
            continue
        n_ex = text.count("Exchange")
        # Python-eval duplication: collect the UDF expression list from
        # each ArrowEvalPython/BatchEvalPython node's WHOLE detail block
        # (r17 ADVICE: a fixed one-line lookahead between the header and
        # the Arguments line silently parses 0 evals if a Spark version
        # emits extra detail lines — match within the block instead, and
        # warn when a plan mentions EvalPython but zero evals parse).
        eval_blocks = re.findall(
            r"^\(\d+\) (?:ArrowEvalPython|BatchEvalPython)\s*\n(.*?)(?=^\(\d+\) |\Z)",
            text,
            flags=re.S | re.M,
        )
        evals = []
        for blk in eval_blocks:
            m = re.search(r"^Arguments: \[(.*?)\], \[", blk, flags=re.M)
            if m:
                evals.append(m.group(1))
        if "EvalPython" in text and not evals:
            print(
                f"WARN {name}: plan mentions EvalPython but zero eval "
                "signatures parsed — detail format drifted?",
                file=sys.stderr,
            )
        sigs = [re.sub(r"#\d+", "#", e) for e in evals]
        dups = {s for s in sigs if sigs.count(s) > 1}
        n_nl = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", text))
        # guide §2.3: payload columns (document text / embeddings /
        # shingle arrays) flowing into an Exchange — each flag is a
        # shuffle carrying heavy bytes; adjudicate per-op (some are the
        # measured-cheapest layout, e.g. carrying verify sets).
        wide_ex = 0
        for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", text):
            cols = m.group(1)
            if re.search(r"\b(text|body|sh|sh_set|sh_c|e|ea|eb|emb|embedding)#", cols):
                wide_ex += 1
        # guide §6: a Filter directly above a parquet scan whose OWN
        # PushedFilters is empty — the predicate did not reach that scan.
        # (r17 ADVICE: the old check conjoined two plan-wide conditions —
        # any Filter→Scan pair anywhere AND any empty PushedFilters
        # anywhere, even on different scans — and its tree regex could
        # not match ':'-prefixed nested tree lines. Pair each Filter with
        # ITS child scan via the node id and read that scan's detail.)
        unpushed = 0
        tree_lines = text.splitlines()
        for i in range(len(tree_lines) - 1):
            if not re.search(r"\+- Filter \(\d+\)\s*$", tree_lines[i]):
                continue
            m2 = re.search(r"\+- Scan parquet\s*\((\d+)\)\s*$", tree_lines[i + 1])
            if not m2:
                continue
            blk = re.search(
                r"^\(%s\) Scan parquet\s*\n(.*?)(?=^\(\d+\) |\Z)" % m2.group(1),
                text,
                flags=re.S | re.M,
            )
            if blk and re.search(r"^PushedFilters: \[\]", blk.group(1), flags=re.M):
                unpushed += 1
        notes = []
        if dups:
            notes.append(f"DUP-PYEVAL x{len(dups)}: " + "; ".join(sorted(dups))[:160])
        if n_nl and name not in NONEQUI_OK:
            notes.append(f"NONEQUI x{n_nl}")
        if unpushed:
            notes.append(f"UNPUSHED-FILTER x{unpushed}")
        if wide_ex:
            notes.append(f"WIDE-EXCHANGE x{wide_ex}")
        rows.append((name, n_ex, len(evals), n_nl, " | ".join(notes)))

    rows.sort(key=lambda r: (-len(r[4]), -r[1]))
    flagged = [r for r in rows if r[4]]
    print(f"\n=== {len(rows)} batch plans audited, {len(flagged)} flagged ===")
    for name, n_ex, n_ev, n_nl, note in rows:
        if note:
            print(f"FLAG {name}: Exchange x{n_ex}, pyeval x{n_ev} — {note}")
    print("\n=== top 20 by Exchange count ===")
    for name, n_ex, n_ev, n_nl, note in sorted(rows, key=lambda r: -r[1])[:20]:
        print(f"{n_ex:3d} Exchange, {n_ev:2d} pyeval  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
