#!/usr/bin/env python
"""sf1 -> sf10 spot-check for the heaviest LIVE queries (VERDICT r9 #5):
wall time plus the state-store evidence the batch-side study can't see —
per-query micro-batch count and the max state rows / bytes each stateful
operator held, captured with a StreamingQueryListener (so it works for
every catalog query regardless of how it starts its streams).

The design claims under test:
- streaming_freq_cm / streaming_quantile_sketch: state is a FIXED cell
  table (<= 2048 CM cells / <= groups x ~512 histogram cells) however
  large the input — state rows must stay FLAT from sf1 to sf10.
- streaming_adclick_blacklist: user-keyed counter state, event-time
  GC'd — state rows track |users|, not |events|.
- streaming_asof_attribution: stream-stream range join, state bounded
  by the join horizon x arrival rate.

Usage: python tools/profile_streaming_sf10.py <sf_dir> [q1,q2,...]
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "streaming_adclick_blacklist",
    "streaming_asof_attribution",
    "streaming_freq_cm",
    "streaming_quantile_sketch",
]


class StateProbe(StreamingQueryListener):
    """Collects per-progress state-operator metrics across every query
    started while attached."""

    def __init__(self):
        self.events = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        ops = []
        for so in p.stateOperators or []:
            ops.append(
                {
                    "op": so.operatorName,
                    "rows": so.numRowsTotal,
                    "bytes": so.memoryUsedBytes,
                }
            )
        self.events.append(
            {
                "runId": str(p.runId),
                "batchId": p.batchId,
                "rows_in": p.numInputRows,
                "ops": ops,
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sf10probe", cpus=cpus)
    probe = StateProbe()
    spark.streams.addListener(probe)
    for name in names:
        # attribution is by runId, not list position: the listener thread
        # appends asynchronously, so a late-draining progress event from
        # the PREVIOUS query must not be counted against this one
        prior_runs = {e["runId"] for e in probe.events}
        t0 = time.perf_counter()
        n_rows = plans.REGISTRY[name].fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        time.sleep(2)  # listener events are async; let the tail drain
        events = [e for e in probe.events if e["runId"] not in prior_runs]
        n_batches = len(events)
        max_state = {}
        for ev in events:
            for op in ev["ops"]:
                cur = max_state.get(op["op"], {"rows": 0, "bytes": 0})
                max_state[op["op"]] = {
                    "rows": max(cur["rows"], op["rows"]),
                    "bytes": max(cur["bytes"], op["bytes"]),
                }
        print(
            json.dumps(
                {
                    "query": name,
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "sec": round(wall, 2),
                    "result_rows": n_rows,
                    "micro_batches": n_batches,
                    "max_state": max_state,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
