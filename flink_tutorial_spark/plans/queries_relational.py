"""Relational core (SURVEY.md §2.3 transforms, §2.5 aggregations,
§2.11 Table/SQL surface), expressed as declarative DataFrame/SQL plans.

Batch analogs of the reference's running (per-record-emitting) keyed
aggregations: the FINAL state of Flink's continuous update stream equals
the batch aggregate, which is exactly what the retract/update output
mode converges to (day10/_02_StreamToTable_Agg.java:55-66 trace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.plans.parity import dec_sum
from flink_tutorial_spark.session import load_table, load_tables


@query(
    "filter_select",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase' AND value > 50.0
""",
    tags=("relational",),
)
def filter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + project — FilterDemo.java:22-35, ProjectDemo.java:25-28,
    Table API where/select day10/_01_StreamToTable.java:39-41.

    Catalyst pushes both the predicate and the 3-column projection into
    the parquet scan (PushedFilters / ReadSchema)."""
    events = load_table(spark, sf_dir, "events")
    return events.where((F.col("event_type") == "purchase") & (F.col("value") > 50.0)).select(
        "event_id", "user_id", "value"
    )


@query(
    "map_transform",
    oracle="""
SELECT event_id,
       upper(event_type) AS event_type_uc,
       round(value * 2.0, 4) AS value_doubled,
       CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS bucket
FROM events
""",
    tags=("relational",),
)
def map_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 map — MapDemo.java:23-47; value-binning chains
    BMWMileAvgCount.scala:31-57. Pure JVM-side expressions (no UDF):
    whole-stage codegen fuses the entire select."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.upper("event_type").alias("event_type_uc"),
        F.round(F.col("value") * 2.0, 4).alias("value_doubled"),
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("bucket"),
    )


@query(
    "flatmap_wordcount",
    oracle="""
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
    tags=("relational", "wordcount"),
)
def flatmap_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap + keyed sum == the wordcount family — StreamWordCount.java:20-37,
    FlatMapDemo.java:27-53. explode(split()) stays in codegen; the count
    is partially aggregated map-side before the single shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "union_streams",
    oracle="""
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'error'
""",
    tags=("relational",),
)
def union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union of same-type streams — UnionDemo.java:24-27 (self-union keeps
    duplicates, hence UNION ALL)."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select("event_id", "event_type", "value")
    errors = events.where(F.col("event_type") == "error").select("event_id", "event_type", "value")
    return clicks.union(errors)


@query(
    "keyed_sum",
    oracle="""
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id, event_type
""",
    tags=("relational", "agg"),
)
def keyed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyed.sum — StreamWordCount.java:37, SumDemo.java:37; composite key
    via multi-column groupBy (KeyedMultipleDemo.java:33-56). The running
    per-record emission converges to this batch aggregate (update mode)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt"), dec_sum("value").alias("sum_value")
    )


@query(
    "keyed_min_max",
    oracle="""
SELECT user_id,
       min(value) AS min_value,
       max(value) AS max_value,
       arg_min(event_type, event_id) AS first_event_type
FROM events
GROUP BY user_id
""",
    tags=("relational", "agg"),
)
def keyed_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyed.min/max — MinMaxDemo.java:34-38: compared field takes the
    extreme, non-compared fields keep the FIRST row's values. First row ==
    min event_id (deterministic), via min_by."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
    )


@query(
    "keyed_minby",
    oracle="""
SELECT user_id, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id ASC) = 1
""",
    tags=("relational", "agg"),
)
def keyed_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyed.minBy — MinByDemo.java:36-60: the WHOLE row of the minimum,
    tie -> first-seen (event_id asc). row_number over (value, event_id)
    ordering replicates the tie rule deterministically in both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("value"), F.asc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "keyed_maxby_last",
    oracle="""
SELECT user_id, event_id, event_type, value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) = 1
""",
    tags=("relational", "agg"),
)
def keyed_maxby_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyed.maxBy(field, first=false) — MinByDemo.java:36-60 tie -> LAST
    occurrence (event_id desc)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "keyed_reduce",
    oracle="""
SELECT l_returnflag,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_qty,
       max(l_extendedprice) AS max_price,
       CAST(count(*) AS BIGINT) AS cnt
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("relational", "agg"),
)
def keyed_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyed.reduce(associative fold) — ReduceDemo.java:26-32. Any
    associative reduce is a Spark agg with map-side partial combine."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dec_sum("l_quantity").alias("sum_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("cnt"),
    )


@query(
    "project_tuple",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    tags=("relational",),
)
def project_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """project(i, j, k) positional tuple projection — ProjectDemo.java:25-28.
    Column pruning reaches the scan: ReadSchema lists only 3 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "activity_count_distinct",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS times,
       CAST(count(DISTINCT user_id) AS BIGINT) AS people
FROM events
GROUP BY event_type
""",
    tags=("relational", "agg"),
)
def activity_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ActivityCount — scala/.../demo/ActivityCount.scala:26-54: count +
    distinct-user count per activity. The reference hand-rolls a HashSet
    in keyed state; Spark's countDistinct is a two-phase distributed
    aggregate (no single-node set)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("times"),
        F.countDistinct("user_id").alias("people"),
    )


@query(
    "sql_agg",
    oracle="""
SELECT event_type, CAST(count(ts) AS BIGINT) AS ct,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type
""",
    tags=("sql",),
)
def sql_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text layer — day10/_09_SQL_Test.java:33, _10_SQL_TestAgg.java:32:
    register view + run SQL verbatim ('select id, count(ts) ct, sum(vc)
    from sensor group by id' shape)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, count(ts) AS ct,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY event_type
        """
    )


@query(
    "sql_group_window",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1, 2
""",
    tags=("sql", "window"),
)
def sql_group_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text group windows — day11/_05_GroupWindow_ProcessTime.java:
    42-63 / _07_GroupWindow_EventTime.java:59-75 (Tumble.over(...).on(...)):
    the Table-API window expressed as `GROUP BY window(ts, ...)` in SQL
    text — the whole day11 surface is this one clause."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT window(ts, '1 hour').start AS window_start,
               event_type,
               count(*) AS cnt,
               round(max(value), 4) AS max_value
        FROM events
        GROUP BY window(ts, '1 hour'), event_type
        """
    )


@query(
    "retract_agg_final",
    oracle="""
SELECT user_id, CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS sum_value
FROM events
WHERE event_type = 'purchase'
GROUP BY user_id
""",
    tags=("sql", "retract"),
)
def retract_agg_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retract-stream final state — day10/_02_StreamToTable_Agg.java:48-66:
    toRetractStream emits (false, old)+(true, new) per update; the
    converged table IS this aggregate. Streaming analog: update output
    mode (see streaming tests)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dec_sum("value").alias("sum_value"))
    )


@query(
    "udaf_weighted_avg",
    oracle="""
SELECT l_returnflag,
       round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                      * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / (100.0 * CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)),
             6) AS w_avg_discount
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("sql", "udaf"),
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered UDAF surface (§2.12, AggregateFunctionDemo.java:30-62):
    quantity-weighted average discount per return flag through a pandas
    GROUPED_AGG UDAF (Arrow whole-group batches — Flink's ACC-class
    accumulate/getValue as one vectorized reduction). The UDAF computes
    on exact scaled integers, so the double it returns is identical in
    both engines regardless of partial-agg order — the ONE deliberate
    Python-UDF query in the relational catalog, demonstrating the slow
    path done right (everything else stays codegen, asserted by
    test_no_python_udf_in_relational_plans)."""
    from flink_tutorial_spark.functions import weighted_avg_udaf

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg_udaf(F.col("l_discount"), F.col("l_quantity")).alias(
            "w_avg_discount"
        )
    )


@query(
    "value_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
""",
    tags=("relational", "agg"),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per key (the BMW-histogram demo's
    analytical sibling): Spark `percentile` and DuckDB `quantile_cont`
    share the standard (n-1)*p linear-interpolation definition, so on
    identical sorted doubles both engines produce the identical IEEE
    result — exact quantiles are a sort-per-group; at scale switch to
    `approx_percentile` (t-digest) the way UV switches to HLL."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
