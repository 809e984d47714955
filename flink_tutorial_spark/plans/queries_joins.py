"""Multi-stream joins (SURVEY.md §2.7) as batch analogs over `events`.

Two "streams" are two filtered views of the events table (view/click/
signup/purchase event types). Every join here has a streaming twin:
stream-stream joins with watermarks + time-range conditions (tested in
tests/test_streaming.py); the batch result equals the converged
streaming output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.session import load_table


def _typed(events: DataFrame, etype: str, prefix: str) -> DataFrame:
    return events.where(F.col("event_type") == etype).select(
        F.col("event_id").alias(f"{prefix}_id"),
        F.col("user_id").alias(f"{prefix}_user"),
        F.col("ts").alias(f"{prefix}_ts"),
        F.col("value").alias(f"{prefix}_value"),
    )


@query(
    "window_join_inner",
    oracle="""
SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id,
       date_trunc('hour', a.ts) AS window_start
FROM (SELECT * FROM events WHERE event_type = 'view') a
JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
""",
    tags=("join", "window"),
)
def window_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window join — TumblingWindowJoinDemo.java:55-91: inner
    join, full cross-product within (key, window). Spark-first: equi-join
    on (key, window bucket) — Catalyst plans one shuffle per side on the
    composite key; within-bucket cross product falls out of the join."""
    events = load_table(spark, sf_dir, "events")
    # materialize the window bucket per side -> plain equi-join on
    # (user_id, window_start): one hash shuffle per side, co-partitioned
    a = events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.window("ts", "1 hour").start.alias("window_start"),
    )
    b = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("b_user"),
        F.window("ts", "1 hour").start.alias("b_window"),
    )
    return a.join(
        b, (a.user_id == b.b_user) & (a.window_start == b.b_window)
    ).select("view_id", "click_id", "user_id", "window_start")


@query(
    "window_cogroup_left_outer",
    oracle="""
SELECT a.event_id AS signup_id, a.user_id,
       date_trunc('hour', a.ts) AS window_start,
       b.event_id AS purchase_id,
       b.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'signup') a
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON a.user_id = b.user_id
 AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
""",
    tags=("join", "window"),
)
def window_cogroup_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed coGroup left-outer join — TumblingWindowLeftJoinDemo.java:
    56-84 (iterate both buffers, emit (left, null) when right empty).
    Spark-first: a plain left join on (key, window) — the null-padding
    the reference hand-writes is the join type."""
    events = load_table(spark, sf_dir, "events")
    a = events.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.window("ts", "1 hour").start.alias("window_start"),
    )
    b = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("b_user"),
        F.window("ts", "1 hour").start.alias("b_window"),
        F.col("value").alias("purchase_value"),
    )
    return a.join(
        b, (a.user_id == b.b_user) & (a.window_start == b.b_window), "left"
    ).select("signup_id", "user_id", "window_start", "purchase_id", "purchase_value")


@query(
    "interval_join",
    oracle="""
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       s.user_id, s.ts AS signup_ts, p.ts AS purchase_ts, p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts - INTERVAL 5 MINUTE
 AND p.ts <= s.ts + INTERVAL 10 MINUTE
""",
    tags=("join", "interval"),
)
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join — IntervalJoinDemo.java:58-68 (.between(-5s,+10s),
    inclusive bounds) / TxMatchWithJoin.scala:38-54. Spark-first: equi-key
    join + time-range condition; in streaming the same plan runs with
    watermarks bounding state (tests/test_streaming.py)."""
    events = load_table(spark, sf_dir, "events")
    s = _typed(events, "signup", "s")
    p = _typed(events, "purchase", "p")
    joined = s.join(
        p,
        (s.s_user == p.p_user)
        & (p.p_ts >= s.s_ts - F.expr("INTERVAL 5 MINUTES"))
        & (p.p_ts <= s.s_ts + F.expr("INTERVAL 10 MINUTES")),
    )
    return joined.select(
        F.col("s_id").alias("signup_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("s_user").alias("user_id"),
        F.col("s_ts").alias("signup_ts"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )


@query(
    "interval_join_exclusive",
    oracle="""
SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts - INTERVAL 5 MINUTE
 AND p.ts < s.ts + INTERVAL 10 MINUTE
""",
    tags=("join", "interval"),
)
def interval_join_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with exclusive upper bound — window/IntervalJoinDemo
    .java:52-62 (.upperBoundExclusive())."""
    events = load_table(spark, sf_dir, "events")
    s = _typed(events, "signup", "s")
    p = _typed(events, "purchase", "p")
    joined = s.join(
        p,
        (s.s_user == p.p_user)
        & (p.p_ts >= s.s_ts - F.expr("INTERVAL 5 MINUTES"))
        & (p.p_ts < s.s_ts + F.expr("INTERVAL 10 MINUTES")),
    )
    return joined.select(
        F.col("s_id").alias("signup_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("s_user").alias("user_id"),
    )


@query(
    "tx_match_full_outer",
    oracle="""
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       coalesce(s.user_id, p.user_id) AS user_id,
       CASE WHEN s.event_id IS NULL THEN 'unmatched-purchase'
            WHEN p.event_id IS NULL THEN 'unmatched-signup'
            ELSE 'matched' END AS match_status
FROM (SELECT * FROM events WHERE event_type = 'signup') s
FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 15 MINUTE
""",
    tags=("join", "outer"),
)
def tx_match_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TxMatch — TxMatch.scala:41-113: hand-rolled CoProcessFunction with
    ValueState + timers emitting matched pairs plus 'unmatched-pay' /
    'unmatched-receipt' side outputs. Spark-first: a FULL OUTER join with
    the time-range condition; the unmatched side-outputs are exactly the
    null-padded rows, no state machine."""
    events = load_table(spark, sf_dir, "events")
    s = _typed(events, "signup", "s")
    p = _typed(events, "purchase", "p")
    j = s.join(
        p,
        (s.s_user == p.p_user)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts <= s.s_ts + F.expr("INTERVAL 15 MINUTES")),
        "full_outer",
    )
    return j.select(
        F.col("s_id").alias("signup_id"),
        F.col("p_id").alias("purchase_id"),
        F.coalesce("s_user", "p_user").alias("user_id"),
        F.when(F.col("s_id").isNull(), "unmatched-purchase")
        .when(F.col("p_id").isNull(), "unmatched-signup")
        .otherwise("matched")
        .alias("match_status"),
    )


@query(
    "connect_comap_union",
    oracle="""
SELECT 'event' AS src, CAST(event_id AS BIGINT) AS id, value AS amount
FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT 'order' AS src, o_orderkey AS id, o_totalprice AS amount
FROM orders WHERE o_orderstatus = 'F'
""",
    tags=("join", "connect"),
)
def connect_comap_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """connect + CoMapFunction — ConnectDemo.java:28-44: two differently-
    typed streams mapped into one output type. Spark-first: normalize
    each side's schema (the map1/map2 bodies) and union."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    a = events.where(F.col("event_type") == "purchase").select(
        F.lit("event").alias("src"),
        F.col("event_id").cast("bigint").alias("id"),
        F.col("value").alias("amount"),
    )
    b = orders.where(F.col("o_orderstatus") == "F").select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
    )
    return a.union(b)


@query(
    "join_asof_attribution",
    oracle="""
WITH v AS (
    SELECT user_id, ts, max(event_id) AS view_id
    FROM events WHERE event_type = 'view' GROUP BY 1, 2
), p AS (
    SELECT event_id AS purchase_id, user_id, ts
    FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
       v.view_id, v.ts AS view_ts,
       CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS gap_sec
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    tags=("join", "asof"),
)
def join_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (temporal) join: last-touch attribution — every purchase
    joined to the user's LATEST view at or before it (the Flink
    temporal-table-join semantics the reference approximates with the
    ±bounded interval join of TxMatchWithJoin.scala:38-54; an as-of
    join has no lower bound). Views are deduped to one per (user, ts)
    by max event_id so the pick at tied timestamps is deterministic —
    the same rule DuckDB's native ASOF LEFT JOIN oracle then applies.

    Spark-first: operators/asof.py — union + last-ignorenulls window,
    ONE shuffle on user_id, no range-join candidate blowup (see the
    module docstring for the 100 TB argument)."""
    from flink_tutorial_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events")
    views = (
        events.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    j = asof_join(purchases, views, on=["user_id"], suffix="_v")
    return j.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("view_id_v").alias("view_id"),
        F.col("ts_v").alias("view_ts"),
        (F.col("ts").cast("long") - F.col("ts_v").cast("long"))
        .cast("long")
        .alias("gap_sec"),
    )
