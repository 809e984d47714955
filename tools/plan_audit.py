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

Streaming queries execute on call, so their micro-batch plans are
censused through a StreamingQueryListener instead (VERDICT r12 #6):
per catalog query the row pins how many streaming queries it starts,
how many micro-batches they run, and the STATE-STORE OPERATOR counts
per run (stateOperators.operatorName from the progress events — the
same channel as the SCALING.md state studies), plus the ordinary
node census of the post-stream batch report plan under "post". A
silently added second stateful operator or a second pipeline now
shows up as a one-line JSON diff, the way batch exchanges do.

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


def _plan_str(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class _StreamProbe:
    """Per-run micro-batch count + state-operator instance counts."""

    def __init__(self):
        from pyspark.sql.streaming import StreamingQueryListener

        probe = self

        class L(StreamingQueryListener):
            def __init__(self):
                self.batches: dict[str, set] = {}
                self.ops: dict[str, dict] = {}

            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                run = str(p.runId)
                self.batches.setdefault(run, set()).add(p.batchId)
                names = sorted(
                    so.operatorName for so in p.stateOperators or []
                )
                if names:  # per-batch instance counts; stable per run
                    counts: dict = {}
                    for n in names:
                        counts[n] = counts.get(n, 0) + 1
                    self.ops[run] = counts

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        self.listener = L()
        assert probe is self


def main() -> None:
    import time

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("planaudit", cpus=8)
    out: dict[str, dict] = {}
    errs = []
    probe = _StreamProbe()
    spark.streams.addListener(probe.listener)
    for name in sorted(plans.REGISTRY):
        streaming = name.startswith("streaming_")
        prior_runs = set(probe.listener.batches)
        try:
            df = plans.REGISTRY[name].fn(spark, sf_dir)
            plan = _plan_str(spark, df)
        except Exception as e:
            errs.append((name, str(e)[:120]))
            continue
        if not streaming:
            out[name] = audit(plan)
            continue
        # streaming: the query already ran to completion inside fn();
        # listener events are async — wait for the tail to drain
        deadline, last = time.time() + 20, None
        while time.time() < deadline:
            cur = {r: set(b) for r, b in probe.listener.batches.items()}
            if cur == last:
                break
            last = cur
            time.sleep(1.0)
        runs = [r for r in probe.listener.batches if r not in prior_runs]
        state_ops: dict[str, int] = {}
        for r in runs:
            for op, c in probe.listener.ops.get(r, {}).items():
                state_ops[op] = state_ops.get(op, 0) + c
        out[name] = {
            "streaming_queries": len(runs),
            "micro_batches": sum(
                len(probe.listener.batches[r]) for r in runs
            ),
            "state_ops": state_ops,
            "post": audit(plan),
        }
    spark.streams.removeListener(probe.listener)
    path = os.path.join(REPO, "PLAN_AUDIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    n_stream = sum(1 for r in out.values() if "streaming_queries" in r)
    tot = {
        k: sum(r.get(k, 0) for r in out.values() if "streaming_queries" not in r)
        for k in COUNTS
    }
    print(
        json.dumps(
            {
                "n_batch_queries": len(out) - n_stream,
                "n_streaming_queries": n_stream,
                "errors": errs,
                "totals": tot,
            }
        )
    )


if __name__ == "__main__":
    main()
