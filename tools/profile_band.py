#!/usr/bin/env python
"""Session-band profiler (VERDICT r10 #2 / r11 #1c): characterize the
~10-15% cross-session offset the r10/r11 bench series showed against
the r9 committed band, using a pure scan+agg headline query with no
streaming state (tpch_q1_pricing_summary) plus the one >2x headline
query (dedup_simhash).

One invocation = ONE fresh Spark session (fresh JVM): warm each query
once at sf0.001 (codegen/JIT), then time N back-to-back runs at sf0.1
and print one JSON line with the full in-session sequence. Run it K
times from a shell loop to get the ACROSS-session distribution; the
in-session sequence separates JIT-depth/warm-up effects (monotone
decay within a session) from a session-level offset (flat sequence,
shifted between sessions).

Usage: python tools/profile_band.py [n_runs_per_query]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

QUERIES = ["tpch_q1_pricing_summary", "dedup_simhash", "keyed_sum"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    t_boot = time.perf_counter()
    spark = get_spark("bandprofile", cpus=cpus)
    boot_sec = time.perf_counter() - t_boot
    out: dict = {"boot_sec": round(boot_sec, 2), "runs": {}}
    from flink_tutorial_spark.operators.dedup import purge_scratch

    for name in QUERIES:
        materialize(plans.REGISTRY[name].fn(spark, WARM_DIR))
        purge_scratch()
        seq = []
        for _ in range(n):
            t0 = time.perf_counter()
            materialize(plans.REGISTRY[name].fn(spark, SF_DIR))
            seq.append(round(time.perf_counter() - t0, 3))
            purge_scratch()
        out["runs"][name] = seq
    print(json.dumps(out))


if __name__ == "__main__":
    main()
