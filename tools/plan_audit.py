"""Physical-plan audit over the bench head → PLANS_r{N}.md.

For every bench-tagged query, summarize the executed-plan structure
the scale story rests on: exchange count (shuffles), broadcast vs
sort-merge joins, whole-stage-codegen span count, Arrow-Python nodes,
and the anti-pattern flags the plan fence enforces (CartesianProduct,
row-wise BatchEvalPython, SinglePartition-fed windows).  Positive
evidence to complement tests/test_plans.py's negative fence.

Usage: python3 tools/plan_audit.py [sf_dir] [out_md]
Plans are built (not executed) — iterative queries still run their
documented O(1) convergence probes, so prefer sf0.001 for a quick
audit; the plan SHAPE is SF-independent.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_cdc_spark.plans import REGISTRY  # noqa: E402
from lakehouse_cdc_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    return {
        # NOTE: counts textual occurrences — plans render reused
        # subtrees repeatedly, so iterative/multi-consumer queries
        # over-count; compare rows relatively, not as shuffle counts
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "single_part": len(re.findall(r"Exchange SinglePartition", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "arrow_py": len(re.findall(r"(MapInPandas|FlatMapGroupsInPandas)", plan)),
        "cartesian": "CartesianProduct" in plan,
        "row_udf": "BatchEvalPython" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLANS_AUDIT.md"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in REGISTRY.items():
        if not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append((name, audit_plan(plan)))
        spark.catalog.clearCache()
    with open(out, "w") as f:
        f.write(
            "# Bench-head physical-plan audit\n\n"
            f"Source SF dir: `{sf_dir}` (plan shape is SF-independent).\n"
            "Columns: hash exchanges / SinglePartition exchanges / "
            "broadcast-hash joins / sort-merge joins / broadcast-NL joins "
            "/ Arrow-Python nodes.\n\n"
            "| query | exch | 1part | BHJ | SMJ | BNLJ | arrowPy |"
            " flags |\n|---|---|---|---|---|---|---|---|\n"
        )
        for name, a in rows:
            flags = []
            if a["cartesian"]:
                flags.append("CARTESIAN")
            if a["row_udf"]:
                flags.append("ROW-UDF")
            f.write(
                f"| {name} | {a['exchanges']} | {a['single_part']} | "
                f"{a['bhj']} | {a['smj']} | {a['bnlj']} | "
                f"{a['arrow_py']} | {','.join(flags) or '—'} |\n"
            )
    bad = [n for n, a in rows if a["cartesian"] or a["row_udf"]]
    print(f"{len(rows)} bench plans audited -> {out}; anti-patterns: {bad or 'none'}")


if __name__ == "__main__":
    main()
