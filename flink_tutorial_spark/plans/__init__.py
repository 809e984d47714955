"""Query plan catalog. Importing this package registers all queries."""

from flink_tutorial_spark.plans import (  # noqa: F401
    queries_datapipe,
    queries_graph,
    queries_joins,
    queries_patterns,
    queries_relational,
    queries_streaming,
    queries_timeseries,
    queries_tpch,
    queries_windows,
)
from flink_tutorial_spark.plans.catalog import (
    REGISTRY,
    all_oracles,
    all_queries,
    rows_only_reasons,
)

__all__ = ["REGISTRY", "all_queries", "all_oracles", "rows_only_reasons"]
