#!/usr/bin/env python
"""RocksDB >heap state profile (VERDICT r2 #6 / r3 #6 / r5 #5).

Demonstrates the production state-scale path: a streaming aggregation
whose keyed state exceeds the executor JVM heap, held by the RocksDB
state store provider (off-heap block cache + local SST files) — the
configuration SCALING.md asserts for 100x state volumes, here measured.

Run STANDALONE (fresh JVM so the driver-memory cap applies):

    python tools/profile_rocksdb_state.py [--heap 1g] [--keys 2000000]
    python tools/profile_rocksdb_state.py --provider hdfs   # expected: OOM

Feeds N unique keys with a ~1 KiB payload each through a file-source
stream into `groupBy(key).agg(max(payload))` (update mode, noop sink):
state = one row per key, total ~N KiB, against a deliberately small
driver heap. The HDFS-backed provider keeps every version of that map
ON HEAP and falls over; RocksDB keeps it off-heap/on-disk and finishes.
Measured numbers land in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--heap", default="1g", help="driver JVM heap (the cap state must exceed)")
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--provider", choices=["rocksdb", "hdfs"], default="rocksdb")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("rocksdb_state_profile")
        .config("spark.driver.memory", args.heap)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        # fail fast instead of GC-thrashing when the on-heap provider
        # exhausts the deliberately small heap
        .config("spark.driver.extraJavaOptions", "-XX:+ExitOnOutOfMemoryError")
    )
    if args.provider == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="rocksdb_state_")
    src = os.path.join(work, "src")
    ckpt = os.path.join(work, "ckpt")
    per_batch = args.keys // args.batches
    assert per_batch > 0, "--keys must be >= --batches"
    # ~1 KiB payload per key: 16x a 64-char sha2 hex digest. No
    # coalesce: single-task 250 MB parquet writes would blow the
    # deliberately tiny heap before streaming even starts.
    print(f"writing {args.batches} x {per_batch} keys with ~1KiB payloads...")
    for b in range(args.batches):
        (
            spark.range(b * per_batch, (b + 1) * per_batch, 1, 4)
            .select(
                F.col("id").alias("key"),
                F.repeat(F.sha2(F.col("id").cast("string"), 256), 16).alias("payload"),
            )
            .write.mode("append" if b else "overwrite")
            .parquet(src)
        )

    stream = (
        spark.readStream.format("parquet")
        .schema("key long, payload string")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    agg = stream.groupBy("key").agg(F.max("payload").alias("payload"))
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    wall = time.perf_counter() - t0
    prog = json.loads(str(q.lastProgress))
    q.stop()
    so = prog["stateOperators"][0]
    jvm_max = spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
    # logical keyed-state volume = what the HDFS-backed provider would
    # have to materialize ON HEAP (its loaded version map). RocksDB's
    # own memory metrics stay bounded by design (block cache +
    # memtables); the SST files hold the rest on disk.
    row_bytes = 8 + 16 * 64  # key long + 1 KiB payload
    logical_state = int(so.get("numRowsTotal", 0)) * row_bytes
    result = {
        "provider": args.provider,
        "heap_cap": args.heap,
        "jvm_max_heap_bytes": int(jvm_max),
        "state_rows": so.get("numRowsTotal"),
        "logical_state_bytes": logical_state,
        "rocksdb_reported_memory": so.get("stateMemory") or so.get("memoryUsedBytes"),
        "custom": {
            k: v
            for k, v in (so.get("customMetrics") or {}).items()
            if any(s in k for s in ("Memory", "Sst", "sst", "Pinned"))
        },
        "wall_sec": round(wall, 1),
    }
    print("RESULT " + json.dumps(result))
    if args.provider == "rocksdb":
        # the generator writes per_batch * batches rows, which floors
        # --keys when it is not divisible by --batches
        assert result["state_rows"] == per_batch * args.batches, result
        assert logical_state > jvm_max, (
            f"logical state {logical_state} bytes does not exceed heap {jvm_max} — "
            "raise --keys for a meaningful >heap profile"
        )
        held = int(result["rocksdb_reported_memory"] or 0)
        print(
            f"OK: {result['state_rows']:,} keyed-state rows = "
            f"{logical_state / 2**30:.2f} GiB logical state vs "
            f"{jvm_max / 2**30:.2f} GiB max heap ({logical_state / jvm_max:.1f}x), "
            f"RocksDB holding only {held / 2**20:.0f} MiB in memory, in {wall:.0f}s"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
