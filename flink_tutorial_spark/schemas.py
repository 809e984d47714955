"""Schema registry: every bean/case class the reference programs parse
(SURVEY.md §1.2), as StructTypes, plus CSV-line parsers.

The reference declares schemas three ways (§1.3): POJO reflection,
connector schema builders, SQL DDL. Here every schema is an explicit
StructType — schema-first, no runtime inference — and `parse_csv_line`
turns a raw text stream into typed columns with from_csv (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _schema(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


#: WaterSensor(id, ts epoch-sec, vc) — cn/ngt/bean/WaterSensor.java:17-21
WATER_SENSOR = _schema(("id", StringType()), ("ts", LongType()), ("vc", IntegerType()))

#: SensorReading(id, timestamp ms, temperature) — streamingwithflink/util/SensorReading.java:7-10
SENSOR_READING = _schema(
    ("id", StringType()), ("timestamp", LongType()), ("temperature", DoubleType())
)

#: UserBehavior(userId, itemId, categoryId, behavior, timestamp sec) — demo/hotitems/HotItems.scala:65
USER_BEHAVIOR = _schema(
    ("user_id", LongType()),
    ("item_id", LongType()),
    ("category_id", IntegerType()),
    ("behavior", StringType()),
    ("timestamp", LongType()),
)

#: ApacheLogEvent(ip, userId, eventTime, method, url) — demo/networkflow/NetworkFlow.scala:70
APACHE_LOG_EVENT = _schema(
    ("ip", StringType()),
    ("user_id", StringType()),
    ("event_time", LongType()),
    ("method", StringType()),
    ("url", StringType()),
)

#: LoginEvent(userId, ip, eventType, eventTime) — demo/loginfail/LoginFail.scala:49
LOGIN_EVENT = _schema(
    ("user_id", LongType()),
    ("ip", StringType()),
    ("event_type", StringType()),
    ("event_time", LongType()),
)

#: OrderEvent(orderId, eventType, txId, eventTime) — demo/orderpaydetect/OrderTimeout.scala:46
ORDER_EVENT = _schema(
    ("order_id", LongType()),
    ("event_type", StringType()),
    ("tx_id", StringType()),
    ("event_time", LongType()),
)

#: ReceiptEvent(txId, payChannel, eventTime) — demo/orderpaydetect/TxMatch.scala:54
RECEIPT_EVENT = _schema(
    ("tx_id", StringType()), ("pay_channel", StringType()), ("event_time", LongType())
)

#: AdClickLog(userId, adId, province, city, timestamp) — demo/market/AdClickAnalysis.scala:55
AD_CLICK_LOG = _schema(
    ("user_id", LongType()),
    ("ad_id", LongType()),
    ("province", StringType()),
    ("city", StringType()),
    ("timestamp", LongType()),
)

#: MarketUserBehavior(userId, behavior, channel, timestamp) — demo/market/AppMarketByChannel.scala:49
MARKET_USER_BEHAVIOR = _schema(
    ("user_id", StringType()),
    ("behavior", StringType()),
    ("channel", StringType()),
    ("timestamp", LongType()),
)

#: ItemViewCount(itemId, windowEnd, count) — demo/hotitems/ItemViewCount
ITEM_VIEW_COUNT = _schema(
    ("item_id", LongType()), ("window_end", LongType()), ("count", LongType())
)

#: LoginFailWarning — demo/loginfail/LoginFail.scala:52
LOGIN_FAIL_WARNING = _schema(
    ("user_id", LongType()),
    ("first_fail_time", LongType()),
    ("last_fail_time", LongType()),
    ("warning_msg", StringType()),
)

#: OrderResult — demo/orderpaydetect/OrderTimeout.scala:48
ORDER_RESULT = _schema(("order_id", LongType()), ("result_msg", StringType()))

REGISTRY: dict[str, StructType] = {
    "water_sensor": WATER_SENSOR,
    "sensor_reading": SENSOR_READING,
    "user_behavior": USER_BEHAVIOR,
    "apache_log_event": APACHE_LOG_EVENT,
    "login_event": LOGIN_EVENT,
    "order_event": ORDER_EVENT,
    "receipt_event": RECEIPT_EVENT,
    "ad_click_log": AD_CLICK_LOG,
    "market_user_behavior": MARKET_USER_BEHAVIOR,
    "item_view_count": ITEM_VIEW_COUNT,
    "login_fail_warning": LOGIN_FAIL_WARNING,
    "order_result": ORDER_RESULT,
}


def parse_csv_line(line_col: Column | str, schema: StructType) -> Column:
    """Typed struct from a raw CSV line (the reference's
    `line.split(",") -> new Bean(...)` map functions, e.g. day10/_01
    _StreamToTable.java:26-30) — JVM-side from_csv, no Python UDF."""
    col = F.col(line_col) if isinstance(line_col, str) else line_col
    return F.from_csv(col, F.lit(schema.simpleString()))


def with_event_time(df: DataFrame, epoch_col: str, unit: str = "s", out_col: str = "ts") -> DataFrame:
    """Epoch long -> TimestampType event time (the reference multiplies
    seconds by 1000 for event time, day11/_03:32; here the unit is
    explicit)."""
    scale = {"s": 1, "ms": 1_000, "us": 1_000_000}[unit]
    return df.withColumn(out_col, F.timestamp_micros(F.col(epoch_col) * (1_000_000 // scale)))
