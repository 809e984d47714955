#!/usr/bin/env python
"""Isolated per-query profiler for optimization work (round 19).

One invocation = one fresh Spark session: for each named catalog query,
warm once at sf0.001 (codegen/JIT), then time N back-to-back runs at
$SPARK_GRAFT_SF_DIR (default sf0.1) and print one JSON line. Same
methodology as tools/profile_band.py but takes the query list on the
command line so any operator can be isolated without editing a file.

Usage: python tools/profile_queries.py [-n runs] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print("usage: profile_queries.py [-n runs] query [query ...]", file=sys.stderr)
        sys.exit(2)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_queries", cpus=cpus)
    from flink_tutorial_spark.operators.dedup import purge_scratch

    out: dict = {"sf_dir": SF_DIR, "cpus": cpus, "runs": {}}
    for name in args:
        spec = plans.REGISTRY[name]
        if os.path.isdir(WARM_DIR) and WARM_DIR != SF_DIR:
            materialize(spec.fn(spark, WARM_DIR))
            purge_scratch()
        seq = []
        for _ in range(n):
            t0 = time.perf_counter()
            materialize(spec.fn(spark, SF_DIR))
            seq.append(round(time.perf_counter() - t0, 3))
            purge_scratch()
        out["runs"][name] = seq
        out["runs"][name + ":min"] = min(seq)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
