"""flink_tutorial_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
kailanyue/flink-tutorial reference (Flink DataStream + Table/SQL tutorial
programs), re-expressed Spark-first:

- relational core      -> DataFrame / Spark SQL (Catalyst optimizes)
- event-time windows   -> window()/session_window() + withWatermark
- keyed state + timers -> applyInPandasWithState
- CEP-lite             -> stateful operator / window-function analogs
- connectors           -> spark.read/readStream + foreachBatch sinks
- training-data ops    -> dedup / similarity / text analysis / multimodal

Design stance: declare logical plans with the DataFrame/SQL API and let
Catalyst + Tungsten pick the physical strategy; drop to Arrow-batched
pandas UDFs only where built-ins can't express the semantics.
"""

from flink_tutorial_spark.session import get_spark, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
