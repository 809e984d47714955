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
    from flink_tutorial_spark.operators.dedup import _scratch_dir

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
    scratch = _scratch_dir() + "/gapfill_b"
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
