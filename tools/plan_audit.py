#!/usr/bin/env python
"""Whole-catalog physical-plan census -> PLAN_AUDIT.json (committed).

tests/test_plans.py::test_catalog_wide_plan_audit GATES the hard flags
(no BatchEvalPython, no CartesianProduct) every run; this tool makes
the whole plan SHAPE diffable round-over-round: per batch query it
counts the plan-node classes that matter at 100 TB — shuffles
(Exchange), broadcast vs sort-merge vs nested-loop joins, generators
(explodes), Python eval nodes, whole-stage-codegen spans — so a
regression like "a broadcast join silently became a sort-merge join"
or "an extra shuffle appeared" shows up as a one-line JSON diff in
review, before it shows up as a bench regression.

Streaming queries execute on call (their plan shape is audited by
their own tests and the state-store listener studies) and are skipped.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001)
Writes PLAN_AUDIT.json at the repo root and prints a summary line.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

COUNTS = {
    "exchange": r"^\(\d+\) Exchange",
    "bhj": r"^\(\d+\) BroadcastHashJoin",
    "smj": r"^\(\d+\) SortMergeJoin",
    "shj": r"^\(\d+\) ShuffledHashJoin",
    "bnlj": r"^\(\d+\) BroadcastNestedLoopJoin",
    "cartesian": r"^\(\d+\) CartesianProduct",
    "python": r"^\(\d+\) BatchEvalPython",
    "arrow": r"^\(\d+\) (?:ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)",
    "generate": r"^\(\d+\) Generate",
    "window": r"^\(\d+\) Window",
    "agg": r"^\(\d+\) (?:HashAggregate|SortAggregate|ObjectHashAggregate)",
}


def audit(plan: str) -> dict:
    row = {k: len(re.findall(p, plan, re.M)) for k, p in COUNTS.items()}
    row["wscg_spans"] = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    return {k: v for k, v in row.items() if v}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("planaudit", cpus=8)
    out: dict[str, dict] = {}
    errs = []
    for name in sorted(plans.REGISTRY):
        if name.startswith("streaming_"):
            continue
        try:
            df = plans.REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:
            errs.append((name, str(e)[:120]))
            continue
        out[name] = audit(plan)
    path = os.path.join(REPO, "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    tot = {k: sum(r.get(k, 0) for r in out.values()) for k in COUNTS}
    print(json.dumps({"n_batch_queries": len(out), "errors": errs, "totals": tot}))


if __name__ == "__main__":
    main()
