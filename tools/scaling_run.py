#!/usr/bin/env python
"""Scale-validation runner (VERDICT r6 #1): time a query subset at two
generator-produced scale points (tools/gen_sf.py) and report per-query
wall seconds, so SCALING.md can record observed scaling exponents
log(t_hi/t_lo)/log(sf_hi/sf_lo) instead of design reasoning alone.

Usage:
  python tools/scaling_run.py <sf_dir> [<label>]
Prints one JSON line: {"label": ..., "queries": {name: sec}, "total": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from flink_tutorial_spark import plans  # noqa: E402
from flink_tutorial_spark.session import get_spark  # noqa: E402

# bench headline set + the full dedup/similarity/clustering families
# (the candidates VERDICT r6 flagged for super-linear terms: shingle
# explosion and connected-components round count)
QUERIES = [
    # headline
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "hot_items_topn", "session_window_gap",
    "keyed_sum", "interval_join", "login_fail_detect", "pv_uv_daily",
    "text_quality", "window_join_inner", "tx_match_full_outer",
    "rollup_revenue", "streaming_running_sum", "streaming_count_window",
    # dedup family
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "dedup_connected_components", "dedup_embedding_nn",
    # similarity family
    "similarity_topk", "similarity_ann_lsh", "similarity_ivf",
    "embedding_kmeans_assign",
]

# SPARK_GRAFT_SCALE_QUERIES overrides the set (comma-separated names) —
# used to extend the study to newly-added operators without re-timing
# the whole list.
_env_queries = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _env_queries:
    QUERIES = [n.strip() for n in _env_queries.split(",") if n.strip()]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1]
    label = sys.argv[2] if len(sys.argv) > 2 else os.path.basename(sf_dir.rstrip("/"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaling", cpus=cpus)
    # single-file-per-table testdata caps scan parallelism at
    # size/maxPartitionBytes tasks; lower it to emulate the many-file
    # fan-out a real table would have (SPARK_GRAFT_MPB, e.g. "8m")
    mpb = os.environ.get("SPARK_GRAFT_MPB")
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    warm_dir = "/root/testdata/sf0.001"
    for name in QUERIES:
        try:
            materialize(plans.REGISTRY[name].fn(spark, warm_dir))
        except Exception:
            pass
    times: dict[str, float] = {}
    for name in QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            materialize(plans.REGISTRY[name].fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        print(f"  {name}: {times[name]}s", file=sys.stderr)
    print(json.dumps(
        {"label": label, "queries": times, "total": round(sum(times.values()), 3)}
    ))


if __name__ == "__main__":
    main()
