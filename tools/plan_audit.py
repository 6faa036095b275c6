#!/usr/bin/env python
"""Physical-plan audit over the benched catalog entries.

For every ``bench=True`` QuerySpec, prints the plan properties the 100 TB
design cares about — distinct data shuffles (hash/range exchanges;
cache-fill exchanges counted once per cached relation), broadcast joins,
single-partition exchanges, sort nodes, parquet PushedFilters presence,
and whole-stage-codegen span count — and writes PLAN_AUDIT.md at the
repo root. Run after plan-affecting changes:

    python tools/plan_audit.py

r14 method fix: counts come from a WALK of the executed plan tree (via
py4j), not from regexes over ``executedPlan().toString()``. The old text
parse split the render at the first ``== Initial Plan ==`` marker to
isolate the AQE-final section — but a persisted frame nests its cached
plan's FULL adaptive render (final + initial sections) inside the outer
final tree, so the split truncated the outer plan at the first nested
cache and silently dropped every operator after it (r14's new persists
made several entries under-count). The walk recurses into
AdaptiveSparkPlanExec.executedPlan(), QueryStageExec.plan() and each
InMemoryRelation's cachedPlan() exactly once (identity-dedup'd), stops
at ReusedExchange/ReusedSubquery so reused subtrees aren't re-counted,
and reads scan pushdown/DPP from the leaf scans' own render.
"""

from __future__ import annotations

import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _walk(node, acc: dict, seen_caches: set, jvm) -> None:
    cls = node.getClass().getSimpleName()
    if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        return  # the original subtree is counted where it executes
    if cls == "AdaptiveSparkPlanExec":
        _walk(node.executedPlan(), acc, seen_caches, jvm)
        return
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), acc, seen_caches, jvm)
        return
    if cls == "ShuffleExchangeExec":
        part = node.outputPartitioning().toString()
        if part.startswith("SinglePartition"):
            acc["single_partition"] += 1
        else:
            acc["shuffles"] += 1
    elif cls == "BroadcastExchangeExec":
        acc["broadcasts"] += 1
    elif cls == "SortExec":
        acc["sorts"] += 1
    elif cls == "CartesianProductExec":
        acc["cartesian"] += 1
    elif cls == "BroadcastNestedLoopJoinExec":
        acc["bnlj"] += 1
    elif cls == "WholeStageCodegenExec":
        acc["codegen_ids"].add(int(node.codegenStageId()))
    elif cls.startswith("FileSourceScan"):
        leaf = node.toString()
        if re.search(r"PushedFilters: \[[^\]]", leaf):
            acc["pushed_filters"] = True
        if "dynamicpruning" in leaf.lower():
            acc["dpp"] = True
    elif cls == "InMemoryTableScanExec":
        rel = node.relation()
        key = jvm.java.lang.System.identityHashCode(rel)
        if key not in seen_caches:  # cache fills once, however many readers
            seen_caches.add(key)
            _walk(rel.cachedPlan(), acc, seen_caches, jvm)
    kids = node.children()
    for i in range(kids.size()):
        _walk(kids.apply(i), acc, seen_caches, jvm)


def audit_plan(df) -> dict:
    jvm = df.sparkSession._jvm
    acc = {
        "shuffles": 0, "broadcasts": 0, "single_partition": 0, "sorts": 0,
        "cartesian": 0, "bnlj": 0, "pushed_filters": False,
        "codegen_ids": set(), "dpp": False,
    }
    _walk(df._jdf.queryExecution().executedPlan(), acc, set(), jvm)
    acc["codegen_spans"] = len(acc.pop("codegen_ids"))
    return acc


def main() -> int:
    from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG
    from automotive_data_pipeline_demo_spark.session import get_spark

    spark = get_spark()
    rows = []
    # benched-adjacent entries audited alongside the headline set (the
    # curation DAG is slated for r7 headline promotion; the r6 curation
    # operators ride along for shuffle-shape visibility)
    extra = {
        "x_curation_e2e", "x_text_line_dedup", "x_text_gopher_rules",
        # r15 (VERDICT r14 item 5): the fan_out-floor family rows not
        # already in the bench set, so the floor's exchange stays
        # audit-visible alongside its plan-budget tests
        "x_dedup_minhash", "x_text_dup_ngrams", "x_text_contamination",
        "x_dedup_jaccard_capped",
    }
    for spec in CATALOG:
        if not (getattr(spec, "bench", False) or spec.name in extra):
            continue
        df = spec.build(spark, SF)
        # execute THIS df's own QueryExecution (a noop write would plan a
        # fresh one) so AQE finalizes — codegen spans and final join
        # strategies only exist on the finalized plan
        df.collect()
        a = audit_plan(df)
        rows.append((spec.name, a))
        spark.catalog.clearCache()
    lines = [
        "# PLAN_AUDIT — physical-plan properties of the benched entries",
        "",
        f"Generated by `tools/plan_audit.py` at sf dir `{SF}` (r14: counts",
        "from an executed-plan tree walk — reused exchanges/subqueries not",
        "re-counted, each cached relation's fill plan counted once; the old",
        "text parse truncated at nested cache renders and under-counted).",
        "Shuffles are DISTINCT hash/range exchanges;",
        "single-partition exchanges are expected only on calendar-grain or",
        "single-row frames; `sorts` counts per-partition Sort nodes (window",
        "and sort-merge operands), not global sorts. Entries whose iterative",
        "stage (label-propagation clustering) executes eagerly at build time",
        "show only the residual final-join plan. Benched-adjacent entries",
        "(x_curation_e2e — slated for r7 headline promotion — plus the r6",
        "curation operators x_text_line_dedup / x_text_gopher_rules) are",
        "audited alongside the headline set.",
        "",
        "| entry | shuffles | broadcasts | 1-part | sorts | codegen spans | pushdown | notes |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, a in rows:
        notes = []
        if a["cartesian"]:
            notes.append(f"cartesian x{a['cartesian']} (exact-baseline by design)")
        if a["bnlj"]:
            notes.append("broadcast NL join (bounded side)")
        if a["dpp"]:
            notes.append("dynamic partition pruning")
        lines.append(
            f"| {name} | {a['shuffles']} | {a['broadcasts']} | "
            f"{a['single_partition']} | {a['sorts']} | {a['codegen_spans']} | "
            f"{'yes' if a['pushed_filters'] else '-'} | {'; '.join(notes) or '-'} |"
        )
    out = os.path.join(_ROOT, "PLAN_AUDIT.md")
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
