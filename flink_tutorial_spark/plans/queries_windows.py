"""Event-time window queries (SURVEY.md §2.6) over the `events` table.

events(event_id bigint, ts timestamp, user_id bigint, event_type string,
       value double, props string-json)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_spark.operators.topn import top_n_per_group
from flink_tutorial_spark.operators.windows import session_window_agg, windowed_agg
from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.plans.parity import dec_avg, dec_sum
from flink_tutorial_spark.session import load_table

# DuckDB helper: sliding-window starts aligned to the epoch, matching
# Spark's F.window alignment. Generates every `slide`-aligned start whose
# [start, start+size) covers some event, then range-joins events in.
_SLIDING_ORACLE = """
WITH starts AS (
    SELECT unnest(generate_series(
        (SELECT date_trunc('hour', min(ts)) - INTERVAL {size_m1_hours} HOUR FROM events),
        (SELECT date_trunc('hour', max(ts)) FROM events),
        INTERVAL {slide_hours} HOUR)) AS window_start
)
"""

HOT_ITEMS_ORACLE = (
    _SLIDING_ORACLE.format(size_m1_hours=5, slide_hours=1)
    + """
, counts AS (
    SELECT s.window_start,
           CAST(json_extract_string(e.props, '$.k') AS INT) AS item_id,
           count(*) AS cnt
    FROM events e
    JOIN starts s
      ON e.ts >= s.window_start AND e.ts < s.window_start + INTERVAL 6 HOUR
    WHERE e.event_type = 'view'
    GROUP BY 1, 2
), ranked AS (
    SELECT *,
           CAST(row_number() OVER (
               PARTITION BY window_start ORDER BY cnt DESC, item_id) AS INT) AS rank
    FROM counts
)
SELECT window_start, item_id, cnt, rank
FROM ranked WHERE rank <= 5
"""
)


@query("hot_items_topn", oracle=HOT_ITEMS_ORACLE, tags=("window", "topn", "flagship"))
def hot_items_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: Top-5 hot items per sliding window (6h window / 1h slide).

    Reference: HotItems.scala:47-136 — filter('pv') -> sliding window
    count per item -> keyBy(windowEnd) + ListState + onTimer sort/take-N.
    Spark-first: window count + row_number() per window. One shuffle for
    the agg (map-side combined), one for the rank — no state machinery.
    """
    events = load_table(spark, sf_dir, "events")
    counts = windowed_agg(
        events.filter(F.col("event_type") == "view").withColumn(
            "item_id", F.get_json_object("props", "$.k").cast("int")
        ),
        ts_col="ts",
        size="6 hours",
        slide="1 hour",
        keys=["item_id"],
        aggs=[F.count("*").alias("cnt")],
    )
    ranked = top_n_per_group(
        counts.select(F.col("w.start").alias("window_start"), "item_id", "cnt"),
        partition_cols=["window_start"],
        order_col="cnt",
        n=5,
        tiebreak_cols=["item_id"],
    )
    return ranked.select("window_start", "item_id", "cnt", "rank")


@query(
    "tumbling_window_count",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    tags=("window",),
)
def tumbling_window_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed tumbling event-time window (1h) count+sum.

    Reference: EvenTimeTumblingWindowDemo.java:43 (keyed tumbling window,
    incremental agg). Hour-aligned tumbling window == date_trunc.
    """
    events = load_table(spark, sf_dir, "events")
    out = windowed_agg(
        events,
        ts_col="ts",
        size="1 hour",
        keys=["event_type"],
        aggs=[F.count("*").alias("cnt"), dec_sum("value").alias("sum_value")],
    )
    return out.select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")


@query(
    "tumbling_window_all",
    oracle="""
SELECT date_trunc('day', ts) AS window_start,
       count(*) AS cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_value
FROM events
GROUP BY 1
""",
    tags=("window",),
)
def tumbling_window_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (non-keyed) tumbling window — Flink windowAll.

    Reference: EvenTimeTumblingWindowAllDemo.java:44 (windowAll forces
    parallelism 1 in Flink; Spark computes the same result with partial
    aggregation across all partitions — strictly better distribution).
    """
    events = load_table(spark, sf_dir, "events")
    out = windowed_agg(
        events,
        ts_col="ts",
        size="1 day",
        keys=[],
        aggs=[F.count("*").alias("cnt"), dec_avg("value").alias("avg_value")],
    )
    return out.select(F.col("w.start").alias("window_start"), "cnt", "avg_value")


SESSION_ORACLE = """
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
), sessioned AS (
    SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM sessioned
GROUP BY user_id, session_id
"""


DYNAMIC_SESSION_ORACLE = """
WITH g AS (
    SELECT user_id, ts,
           CASE WHEN event_type = 'error' THEN 600 ELSE 1800 END AS gap_s
    FROM events
), flagged AS (
    SELECT user_id, ts, gap_s,
           CASE WHEN max(ts + gap_s * INTERVAL 1 SECOND) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR ts >= max(ts + gap_s * INTERVAL 1 SECOND) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                THEN 1 ELSE 0 END AS new_session
    FROM g
), sessioned AS (
    SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts + gap_s * INTERVAL 1 SECOND) AS session_end,
       CAST(count(*) AS BIGINT) AS cnt
FROM sessioned
GROUP BY user_id, session_id
"""


@query("session_window_dynamic_gap", oracle=DYNAMIC_SESSION_ORACLE, tags=("window", "session"))
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record dynamic session gap — ProcessingTimeSessionWindowDemo.
    java:43 (withDynamicGap(e -> ...)): each event proposes its own gap
    (10 min for errors, 30 min otherwise); overlapping [ts, ts+gap)
    windows merge. The oracle is the classic interval-merge via
    cumulative-max-end; Spark's session_window(ts, gap_expr) implements
    the same semantics natively."""
    events = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "error", "10 minutes").otherwise("30 minutes")
    out = session_window_agg(
        events, ts_col="ts", gap=gap, keys=["user_id"], aggs=[F.count("*").alias("cnt")]
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "cnt",
    )


@query("session_window_gap", oracle=SESSION_ORACLE, tags=("window", "session"))
def session_window_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute gap.

    Reference: EventTimeSessionWindowDemo.java:43 (EventTimeSession
    Windows.withGap). Spark session_window(start=first ts, end=last ts +
    gap) == the lag/cumsum sessionization the oracle spells out.
    """
    events = load_table(spark, sf_dir, "events")
    out = session_window_agg(
        events,
        ts_col="ts",
        gap="30 minutes",
        keys=["user_id"],
        aggs=[F.count("*").alias("cnt"), dec_sum("value").alias("sum_value")],
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "cnt",
        "sum_value",
    )
