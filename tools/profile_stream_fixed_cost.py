#!/usr/bin/env python
"""Streaming micro-batch fixed-cost study (VERDICT r8 #7): the ~1.5-3 s
per live catalog query is half the full-catalog wall. Two questions:

1. AMORTIZATION — does reusing one warm SparkSession across consecutive
   live queries beat fresh-session-per-query (what an external harness
   that re-imports per query would pay)? Measures the same query run
   (a) back-to-back in one session (today's bench path) and (b) in a
   fresh `spark.newSession()` each time, plus the first-ever run of the
   session (cold JVM path) for reference.

2. STATE-SHUFFLE SWEEP — run.py pins spark.sql.shuffle.partitions=8 for
   streaming queries (SPARK_GRAFT_STREAM_SHUFFLE). Sweep it at sf1 for
   a cheap and an expensive stateful query to bound the knob's value.

Usage: python tools/profile_stream_fixed_cost.py <sf_dir>
Prints one JSON line per experiment row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

AMORTIZE_QUERIES = [
    "streaming_running_sum",      # cheapest live query (1 stateful stage)
    "streaming_tumbling_window",  # windowed agg in append mode
    "streaming_transitions",      # bucketed stateful + chained agg
]
SWEEP_QUERIES = ["streaming_running_sum", "streaming_scd2"]
SWEEP_VALUES = [1, 4, 8, 16, 32]


def run_query(spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    plans.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("stream_fixed_cost")

    # --- experiment 1: session amortization -------------------------------
    for name in AMORTIZE_QUERIES:
        cold = run_query(spark, name, sf_dir)  # first run: plans + exec cold
        warm = [run_query(spark, name, sf_dir) for _ in range(3)]
        fresh = []
        for _ in range(3):
            s2 = spark.newSession()
            fresh.append(run_query(s2, name, sf_dir))
        print(json.dumps({
            "exp": "amortize", "query": name, "cold_first": cold,
            "warm_same_session": warm, "fresh_session": fresh,
            "warm_best": min(warm), "fresh_best": min(fresh),
        }))

    # --- experiment 2: stream shuffle-partition sweep ---------------------
    for name in SWEEP_QUERIES:
        row = {"exp": "sweep", "query": name}
        for n in SWEEP_VALUES:
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE"] = str(n)
            run_query(spark, name, sf_dir)  # settle
            row[f"p{n}"] = min(run_query(spark, name, sf_dir) for _ in range(2))
        os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE", None)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
