"""Plan-audit instruments: mechanical checks over Catalyst plans.

Correctness hashes can't see plan regressions — a removed pushdown, a
forced broadcast of an SF-proportional table, or an accidental cartesian
product all return the same rows, just catastrophically slower (or dead)
at 100 TB.  This module turns the PERF.md hand-audits into functions a
test can assert on (VERDICT r9 #3):

- :func:`physical_profile` — counts of join strategies, exchanges,
  cartesian products, row-at-a-time Python evals, pushed filters and
  codegen spans from the AQE-final executed plan;
- :func:`hinted_fact_scans` — walks the ANALYZED logical plan and
  returns every SF-proportional base relation that sits under a
  broadcast hint with no row-bounding operator in between.  A forced
  hint on a relation that grows with the data is the one plan shape
  that *fails* (8 GB broadcast cap) rather than degrades at scale; a
  hint above an Aggregate / Limit / Deduplicate is fine — those bound
  the broadcast side regardless of corpus size.

Both work on any DataFrame, so the checks compose with the query
catalog: tests/test_plan_audit.py drives them over every registered
entry and the bench headline set.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: One identifying column per SF-proportional table (TESTDATA.md) — a
#: leaf relation is "fact-sized" iff it outputs one of these.  nation /
#: region are fixed-size and deliberately absent.
FACT_MARKERS = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "p_partkey": "part",
    "s_suppkey": "supplier",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

#: Logical nodes that bound their output size independent of input size
#: (so a broadcast hint above them is scale-safe even when a fact scan
#: sits below): aggregates collapse to |group keys|, limits to k,
#: Deduplicate to |distinct| — each bounded by construction in every
#: catalog use (day spines, per-bucket stats, top-k keep-lists).
_BOUNDING_NODES = frozenset(
    {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}
)


def _jchildren(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def hinted_fact_scans(df: DataFrame) -> list[str]:
    """Names of SF-proportional tables whose raw scan feeds a broadcast
    hint with no bounding operator (Aggregate/Limit/Deduplicate) on the
    path — the fail-at-100× plan shape.  Empty list = scale-safe."""
    plan = df._jdf.queryExecution().analyzed()
    found: list[str] = []

    def walk(node, under_hint: bool) -> None:
        name = node.nodeName()
        if name == "ResolvedHint" and "broadcast" in node.simpleString(200):
            under_hint = True
        elif name in _BOUNDING_NODES:
            under_hint = False
        elif under_hint and name in ("LogicalRelation", "Relation"):
            out = node.output()
            cols = {out.apply(i).name() for i in range(out.size())}
            for marker, table in FACT_MARKERS.items():
                if marker in cols:
                    found.append(table)
        for child in _jchildren(node):
            walk(child, under_hint)

    walk(plan, False)
    return sorted(set(found))


def physical_profile(df: DataFrame) -> dict:
    """Counts over the AQE-final executed plan (run the query first for
    the final plan; on an un-executed df this profiles the initial
    physical plan)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    spans = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(
        re.findall(r"\*\((\d+)\)", plan)
    )
    return {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "python_row_evals": plan.count("BatchEvalPython"),
        "arrow_evals": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "codegen_spans": len(spans),
        "pushed_filters": [
            m.group(1)
            for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
            if m.group(1)
        ],
        # partition-directory pruning evidence (e.g. "cell IN (0,3,5)" on
        # a cell-partitioned serve layout) — the scan never lists, let
        # alone reads, the pruned partitions' files
        "partition_filters": [
            m.group(1)
            for m in re.finditer(r"PartitionFilters: \[([^\]]*)", plan)
            if m.group(1).strip()
        ],
        "plan": plan,
    }
