"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_tutorial_spark.plans.catalog — the query registry
is the single source of truth; every registered QuerySpec surfaces here
as a queries() entry (and an oracle_sql() entry when SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_tutorial_spark import plans  # noqa: E402  (registers all queries)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (hot-items Top-N) on /root/testdata/sf0.001."""
    return plans.REGISTRY["hot_items_topn"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return plans.all_oracles()


def rows_only_reason() -> dict[str, str]:
    """For queries() entries with no oracle_sql(): WHY they are rows-only.

    These checks are rows-only BY DESIGN (approximate algorithms or
    wall-clock-dependent semantics), not missing oracles — machine-readable
    so the driver/judge can distinguish intent from breakage.
    """
    return plans.rows_only_reasons()
