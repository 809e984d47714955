#!/usr/bin/env python
"""Profile the Spark 4.1 streaming micro-batch overhead (VERDICT r5 #1).

Runs a regressed pure-JVM streaming query (interval join shape — no
Python UDF anywhere, so any overhead is framework-side) and prints the
per-micro-batch durationMs breakdown from StreamingQueryProgress, then
repeats under candidate conf overrides to isolate which 4.1 default
moved.
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_tutorial_spark.session import get_spark  # noqa: E402
from flink_tutorial_spark.streaming.run import stream_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build(spark):
    events = stream_table(spark, SF_DIR, "events")
    s = (
        events.where(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_id"),
                F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "1 hour")
    )
    p = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    return s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 10 MINUTES")),
    )


def run_once(spark, label, confs=None, state_partitions=8):
    prev = {}
    for k, v in (confs or {}).items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    sp_prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    name = f"mem_{uuid.uuid4().hex[:10]}"
    t0 = time.perf_counter()
    q = build(spark).writeStream.outputMode("append").format("memory").queryName(name).start()
    spark.conf.set("spark.sql.shuffle.partitions", sp_prev)
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    prog = [json.loads(str(pj)) for pj in q.recentProgress]
    q.stop()
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    rows = spark.table(name).count()
    print(f"\n=== {label}: wall={wall:.2f}s rows={rows} batches={len(prog)}")
    for pr in prog:
        dm = pr.get("durationMs", {})
        so = pr.get("stateOperators", [])
        commit = sum(s.get("commitTimeMs", 0) for s in so)
        print(f"  batch {pr['batchId']}: rows={pr.get('numInputRows')} "
              f"trigger={dm.get('triggerExecution')} addBatch={dm.get('addBatch')} "
              f"getBatch={dm.get('getBatch')} latestOffset={dm.get('latestOffset')} "
              f"planning={dm.get('queryPlanning')} walCommit={dm.get('walCommit')} "
              f"commitOffsets={dm.get('commitOffsets')} stateCommitMs={commit}")
    return wall


def main():
    spark = get_spark("profile41")
    run_once(spark, "warmup")
    base = run_once(spark, "baseline (8 state partitions)")
    experiments = [
        ("unloadOnCommit=false (explicit)", {"spark.sql.streaming.stateStore.unloadOnCommit": "false"}, 8),
        ("maintenanceInterval=10min", {"spark.sql.streaming.stateStore.maintenanceInterval": "600s"}, 8),
        ("commitValidation off", {"spark.sql.streaming.stateStore.commitValidation.enabled": "false"}, 8),
        ("asyncLog purge", {"spark.sql.streaming.asyncLogPurge.enabled": "true"}, 8),
        ("state partitions=4", {}, 4),
        ("state partitions=16", {}, 16),
    ]
    results = {"baseline": base}
    for label, confs, parts in experiments:
        try:
            results[label] = run_once(spark, label, confs, parts)
        except Exception as e:
            print(f"  {label} FAILED: {e}")
    print("\nSUMMARY", json.dumps({k: round(v, 2) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
