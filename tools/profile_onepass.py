#!/usr/bin/env python
"""Scan-count evidence for the one-pass foreachBatch fan-out twins
(VERDICT r12 #1): run each one-pass catalog query and its two-pipeline
sibling at $SPARK_GRAFT_SF_DIR (default sf0.1), capturing per-query
streaming progress (numInputRows) with a StreamingQueryListener, and
print one JSON line per run: queries started, total source rows
ingested, source rows on disk, wall seconds. The deployment claim is
ingested == 1x source rows for the one-pass shape vs 2x for the
two-pipeline shape. Results recorded in SCALING.md "one-pass fan-out".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql.streaming import StreamingQueryListener  # noqa: E402

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark, load_table  # noqa: E402

PAIRS = [
    ("streaming_uv_kmv_onepass", "streaming_uv_kmv_trailing"),
    ("streaming_uv_hll_onepass", "streaming_uv_hll_registers"),
    # r14: additive sinks through the epoch ledger
    ("streaming_freq_cm_onepass", "streaming_freq_cm"),
    ("streaming_adclick_onepass", "streaming_adclick_blacklist"),
    ("streaming_quantile_onepass", "streaming_quantile_sketch"),
]


class Probe(StreamingQueryListener):
    def __init__(self):
        self.rows = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.rows[(str(p.id), p.batchId)] = p.numInputRows

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def drain(probe: Probe, deadline_s: float = 30.0):
    last = None
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        cur = dict(probe.rows)
        if cur and cur == last:
            break
        last = cur
        time.sleep(1.0)


def main() -> None:
    spark = get_spark("profile_onepass", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    n_src = load_table(spark, SF_DIR, "events").count()
    for names in PAIRS:
        for name in names:
            # fresh-ish timing: each query builds its own scratch state
            probe = Probe()
            spark.streams.addListener(probe)
            t0 = time.time()
            n_out = plans.REGISTRY[name].fn(spark, SF_DIR).count()
            wall = time.time() - t0
            drain(probe)
            spark.streams.removeListener(probe)
            queries = {q for (q, _) in probe.rows}
            print(
                json.dumps(
                    {
                        "query": name,
                        "streaming_queries": len(queries),
                        "rows_ingested": sum(probe.rows.values()),
                        "source_rows": n_src,
                        "scan_multiple": round(
                            sum(probe.rows.values()) / n_src, 3
                        ),
                        "out_rows": n_out,
                        "wall_sec": round(wall, 3),
                        "sf_dir": SF_DIR,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
