"""Dump executed plans for the bench headline queries.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

Prints, per query: join strategies, exchanges, pushed filters, read
schemas, and whole-stage-codegen span count — the evidence PERF.md's
plan-audit section summarizes.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKERS = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "BroadcastNestedLoopJoin",
    "ShuffledHashJoin",
    "Exchange hashpartitioning",
    "ReusedExchange",
    "TakeOrderedAndProject",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
]


def main() -> None:
    from bench import HEADLINE

    from hfp_loader_spark.audit import hinted_fact_scans, physical_profile
    from hfp_loader_spark.plans.catalog import REGISTRY
    from hfp_loader_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or [n for n in HEADLINE if not n.startswith("streaming")]

    spark = get_spark(app_name="explain_audit")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        hinted = hinted_fact_scans(df)
        df.collect()  # let AQE finalize
        p = physical_profile(df)
        plan = p.pop("plan")
        print(f"\n=== {name} ===")
        counts = {m: plan.count(m) for m in MARKERS if plan.count(m)}
        print("  operators:", counts or "(projection/aggregate only)")
        print("  codegen spans:", p["codegen_spans"])
        if hinted:
            print("  !! broadcast hint on fact scan:", hinted)
        for f in p["pushed_filters"]:
            print("  pushed:", f[:120])
        for m in re.finditer(r"ReadSchema: (struct<[^>]{0,120})", plan):
            print("  read:", m.group(1))


if __name__ == "__main__":
    main()
