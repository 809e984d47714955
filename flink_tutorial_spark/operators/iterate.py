"""Iteration operator (SURVEY.md §2.7 last row).

IterateDemo.java:22-52: `iterate()`/`closeWith(feedback)` builds a
dataflow feedback loop — records failing the exit predicate re-enter
the loop body. Structured Streaming has no cyclic dataflow (documented
non-goal); the Spark-first equivalent is a driver-side iterative batch
loop, which is how Spark expresses every iterative algorithm (ALS,
PageRank, connected components).

Each iteration is a full distributed transformation; only the loop
CONTROL is on the driver (a count per round), never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_tutorial_spark import plan_capture


def iterate(
    df: DataFrame,
    body,
    exit_filter,
    max_iterations: int = 100,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Apply `body(df)` repeatedly; rows satisfying `exit_filter` leave
    the loop, the rest feed back — the exact IterateDemo contract
    (map(x-2) body, filter(x>0) feedback, trace IterateDemo.java:58-70).

    Returns the union of all exited rows. localCheckpoint every few
    rounds truncates the growing lineage (the scale hazard of iterative
    plans)."""
    spark = df.sparkSession
    done = spark.createDataFrame([], df.schema)
    current = df
    for i in range(max_iterations):
        if current.isEmpty():
            break
        stepped = body(current)
        exited = stepped.filter(exit_filter)
        done = done.unionByName(exited)
        current = stepped.filter(~exit_filter)
        if (i + 1) % checkpoint_every == 0:
            current = plan_capture.checkpoint(current, "ckpt:iterate_current")
            done = plan_capture.checkpoint(done, "ckpt:iterate_done")
    return done
