"""Time-series shaping queries: dense-grid gap filling and SCD2
interval compression — the two transforms every metrics/warehouse
pipeline runs between raw events and a queryable serving table.

The reference's window queries aggregate only buckets that HAVE data
(HotItems.scala sliding counts, the Tumble/Slide Table windows in
cn/ngt/day10); a serving layer needs the complementary op — emit every
bucket on a dense per-key grid and carry the last observation forward.
SCD2 is the batch dual of the reference's state-change streams
(TempRiseAlert.scala's lag-compare): compress a change log into
validity intervals.
"""

from __future__ import annotations

from flink_tutorial_spark import plan_capture
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.session import load_table


@query(
    "timeseries_gap_fill",
    oracle="""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS v_fp
  FROM events GROUP BY 1, 2
), span AS (
  SELECT min(h) AS h0, max(h) AS h1 FROM b
), grid AS (
  SELECT k.event_type, g.h
  FROM (SELECT DISTINCT event_type FROM b) k
  CROSS JOIN (SELECT unnest(generate_series((SELECT h0 FROM span),
                                            (SELECT h1 FROM span),
                                            INTERVAL 1 HOUR)) AS h) g
)
SELECT grid.event_type, grid.h AS bucket,
       b.h IS NULL AS filled,
       CAST(COALESCE(b.n, 0) AS BIGINT) AS n_events,
       round(f.v_fp / (f.n * 1000000.0), 6) AS avg_value
FROM grid
LEFT JOIN b ON b.event_type = grid.event_type AND b.h = grid.h
ASOF LEFT JOIN b f ON f.event_type = grid.event_type AND f.h <= grid.h
""",
    tags=("timeseries", "window"),
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse-to-dense hourly series with forward fill: per event_type,
    every hour between the global first and last bucket gets a row;
    empty buckets carry the latest earlier bucket's average forward
    (leading gaps before a key's first observation stay NULL). The
    per-bucket average is computed from a 6-dp fixed-point sum so the
    carried value is bit-exact cross-engine.

    Scale shape: one partial-aggregable groupBy builds the sparse
    buckets (that shuffle is the whole data-sized cost); the dense
    grid is |keys| x |hours| rows generated from a 1-row span
    aggregate (sequence + explode, no data shuffle); the fill is one
    per-key ordered window over GRID-sized input — at 100 TB the grid
    is many orders smaller than the events it summarizes. The Spark
    fill (last-non-null running window) and the oracle's ASOF join
    express the same semantics; Spark would also accept the
    sequence+explode grid at billions of buckets since it's generated
    distributed, keyed by the grid key."""
    from flink_tutorial_spark.operators.dedup import scratch_dir

    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.round(F.col("value") * 1000000, 0).cast("long")).alias("v_fp"),
    )
    # materialize the bucket table once (grid keys, span and the join all
    # read it): without this each branch prunes the scan differently and
    # Spark re-reads + re-aggregates events THREE times — the scratch
    # checkpoint makes the events scan the single data-sized pass (same
    # rationale as the minhash signature checkpoint, dedup.py:252)
    scratch = scratch_dir() + "/gapfill_b"
    plan_capture.capture_df(b, "scratch:ts_buckets")
    b.write.mode("overwrite").parquet(scratch)
    b = spark.read.parquet(scratch)
    span = b.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    keys = b.select("event_type").distinct()
    # rename the grid key: grid derives from b, so joining grid back to b
    # on a same-named column would resolve ambiguously
    grid = keys.crossJoin(span).select(
        F.col("event_type").alias("k"),
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    joined = grid.join(
        b,
        (grid["k"] == b["event_type"]) & (grid["bucket"] == b["h"]),
        "left",
    ).select(F.col("k").alias("event_type"), "bucket", "h", "n", "v_fp")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = F.last(
        F.when(F.col("h").isNotNull(), F.struct("n", "v_fp")), ignorenulls=True
    ).over(w)
    return joined.select(
        "event_type",
        "bucket",
        F.col("h").isNull().alias("filled"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(fill["v_fp"] / (fill["n"] * F.lit(1000000.0)), 6).alias("avg_value"),
    )


@query(
    "scd2_item_intervals",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item,
         ts, event_id
  FROM events
), o AS (
  SELECT user_id, item, ts, event_id,
         lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM ev
), ch AS (
  SELECT user_id, item, ts, event_id FROM o
  WHERE prev IS NULL OR prev <> item
)
SELECT user_id, item AS item_id,
       ts AS effective_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS effective_to,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS version,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           AS is_current
FROM ch
""",
    tags=("timeseries", "window"),
)
def scd2_item_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 compression of a change stream: per user, collapse
    consecutive repeats of the same item and emit validity intervals
    [effective_from, effective_to) with a version counter and an
    is_current flag — the standard dimension-history build (the batch
    dual of TempRiseAlert.scala:24-40's lag-compare alerting).

    Scale shape: two windows over the SAME (user_id, (ts, event_id))
    partitioning — Spark reuses the one sort-shuffle for both (lag to
    find change points, lead/row_number over the filtered change rows
    re-partitions only change rows, which is the compressed, smaller
    set). No joins, no driver state."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("item"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = (
        ev.withColumn("prev", F.lag("item").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("item")))
        .drop("prev")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ch.select(
        "user_id",
        F.col("item").alias("item_id"),
        F.col("ts").alias("effective_from"),
        F.lead("ts").over(w2).alias("effective_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@query(
    "timeseries_anomaly",
    oracle="""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, h, v,
         CAST(count(*) OVER roll AS BIGINT) AS n,
         CAST(sum(v) OVER roll AS BIGINT) AS s,
         CAST(sum(v * v) OVER roll AS HUGEINT) AS s2
  FROM b
  WINDOW roll AS (PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT event_type, h, n, v, s,
         sqrt(greatest(1.0 * s2 / n - (1.0 * s / n) * (1.0 * s / n), 0)) AS sd
  FROM w WHERE n >= 12
)
SELECT event_type, h AS bucket, n AS n_window,
       round(v / 1000.0, 6) AS value,
       round(s / n / 1000.0, 6) AS roll_mean,
       round(sd / 1000.0, 6) AS roll_std,
       round(CASE WHEN sd > 0 THEN (v - 1.0 * s / n) / sd ELSE 0 END, 4) AS z,
       (sd > 0 AND abs(v - 1.0 * s / n) >= 3 * sd) AS is_anomaly
FROM z
""",
    tags=("timeseries", "window"),
)
def timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the hourly value series —
    the alerting op every metrics pipeline runs downstream of the
    reference's window aggregates (TempRiseAlert's fixed-threshold
    compare generalized to a self-calibrating baseline): each bucket is
    scored against the mean/std of its 24 PRECEDING buckets (current
    excluded, so an anomaly can't mask itself), flagged at |z| >= 3
    once 12 baseline buckets exist.

    Bit-exactness: bucket sums are 3-dp fixed-point BIGINTs, and the
    rolling sum/sum-of-squares stay exact integers (Spark side sums
    v*v as DECIMAL(38,0) — silent BIGINT wraparound is the trap — and
    DuckDB's HUGEINT matches); both engines then evaluate the
    IDENTICAL double expression tree off those exact integers, so
    mean/std/z agree to the last bit before rounding.

    Scale shape: one partial-aggregable groupBy to bucket, then one
    per-key ordered window over BUCKET-sized data (|keys| x |hours|
    rows, orders of magnitude below the events it summarizes)."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.round(F.col("value") * 1000, 0).cast("long")).alias("v"))
    roll = Window.partitionBy("event_type").orderBy("h").rowsBetween(-24, -1)
    w = b.select(
        "event_type",
        "h",
        "v",
        F.count("*").over(roll).cast("long").alias("n"),
        F.sum("v").over(roll).cast("long").alias("s"),
        # cast BEFORE the multiply: a long*long product wraps silently
        # at |v| ~ 3e9 and only then would hit the decimal cast
        F.sum(
            F.col("v").cast("decimal(19,0)") * F.col("v").cast("decimal(19,0)")
        ).over(roll).alias("s2"),
    ).where(F.col("n") >= 12)
    mean = F.lit(1.0) * F.col("s") / F.col("n")
    sd = F.sqrt(
        F.greatest(
            F.lit(1.0) * F.col("s2").cast("double") / F.col("n")
            - (F.lit(1.0) * F.col("s") / F.col("n"))
            * (F.lit(1.0) * F.col("s") / F.col("n")),
            F.lit(0.0),
        )
    )
    return w.select(
        "event_type",
        F.col("h").alias("bucket"),
        F.col("n").alias("n_window"),
        F.round(F.col("v") / 1000.0, 6).alias("value"),
        F.round(F.col("s") / F.col("n") / 1000.0, 6).alias("roll_mean"),
        F.round(sd / 1000.0, 6).alias("roll_std"),
        F.round(
            F.when(sd > 0, (F.col("v") - mean) / sd).otherwise(0.0), 4
        ).alias("z"),
        ((sd > 0) & (F.abs(F.col("v") - mean) >= 3 * sd)).alias("is_anomaly"),
    )


@query(
    "timeseries_ema",
    oracle="""
WITH seq AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), w AS (
  SELECT event_type, n, value,
         CASE WHEN rn = 1 THEN n - 1 ELSE n - rn + 1 END AS k
  FROM seq
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       round(sum(CASE WHEN k <= 62
                      THEN value / CAST(CAST(1 AS BIGINT) << k AS DOUBLE)
                      ELSE 0.0 END), 4) AS ema
FROM w GROUP BY event_type
""",
    tags=("timeseries", "agg", "window"),
)
def timeseries_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential moving average per event_type (alpha = 0.5) — the
    time-decayed aggregate that smooths sensor/metric streams
    (TempRiseAlert.scala's lag-compare is the 1-step special case;
    EMA is its infinite-memory generalization). The recursion
    ema_i = a*v_i + (1-a)*ema_(i-1) unrolls to a weighted sum whose
    weights at a = 1/2 are POWERS OF TWO — computed via integer bit
    shift, never pow(), so scaling each value is an EXACT float op in
    both engines and the only cross-engine slack is summation order
    (absorbed by round 4). Weights below 2^-62 are truncated to zero
    identically in both engines (the shift would overflow; the
    dropped mass is < 2e-17 of the total). Sequence order is pinned
    by (ts, event_id) so both engines fold the same sequence.

    Scale shape: one window rank over the key partition + one
    partial-aggregable weighted sum — the same single-shuffle shape
    as keyed_sum; nothing iterative, the unrolled form IS the plan.
    CAVEAT (100 TB): the row_number window partitions by event_type —
    low cardinality — so each key's FULL history sorts inside one
    task (a spillable external sort, but single-task-per-key wall
    time). This batch twin is the CALIBRATION oracle; the deployment
    path at scale is the streaming fold `streaming_ema`
    (stateful.py ema_fold: two scalars of state per key, no history
    materialized). See SCALING.md "Batch EMA single-task-per-key
    bound"."""
    events = load_table(spark, sf_dir, "events")
    wkey = Window.partitionBy("event_type")
    seq = events.select(
        "event_type",
        "value",
        F.row_number().over(wkey.orderBy("ts", "event_id")).alias("rn"),
        F.count("*").over(wkey).alias("n"),
    )
    k = F.when(F.col("rn") == 1, F.col("n") - 1).otherwise(
        F.col("n") - F.col("rn") + 1
    )
    w = seq.select("event_type", "n", "value", k.alias("k"))
    term = F.when(
        F.col("k") <= 62,
        F.col("value")
        / F.expr("CAST(shiftleft(1L, CAST(k AS INT)) AS DOUBLE)"),
    ).otherwise(F.lit(0.0))
    return w.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.round(F.sum(term), 4).alias("ema"),
    )
