"""Partition-layout pruning: the other half of the 100-TB storage story
next to bucketing (tests/test_bucketing.py). A day-partitioned fact
table must (a) prune statically when the query names the day, and
(b) prune DYNAMICALLY when the day set only emerges from a dim-side
filter at runtime (DPP) — at 100 TB these are the difference between
scanning one partition and scanning three years of logs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tutorial_spark.session import load_table


@pytest.fixture(scope="module")
def day_partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    (
        load_table(spark, sf_dir, "events")
        .withColumn("day", F.to_date("ts"))
        .write.partitionBy("day")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_static_partition_pruning(spark, day_partitioned_events):
    all_days = spark.read.parquet(day_partitioned_events)
    one = all_days.where(F.col("day") == "2024-01-05")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-01-05" in plan, plan[:800]
    # execution-observed pruning: the filtered read touches strictly
    # fewer distinct files than the table holds (inputFiles() reflects
    # the unpruned relation, so count what was actually read instead)
    read = one.select(F.input_file_name().alias("f")).distinct().count()
    assert 0 < read < len(all_days.inputFiles())
    assert "day=2024-01-05" in one.select(F.input_file_name()).first()[0]


def test_dynamic_partition_pruning_from_dim_filter(spark, day_partitioned_events):
    # the day set is only known after filtering the dim side — Spark
    # must inject a runtime DPP subquery into the fact scan instead of
    # scanning every partition
    import datetime

    fact = spark.read.parquet(day_partitioned_events)
    dim = spark.createDataFrame(
        [(datetime.date(2024, 1, 5), "campaign"), (datetime.date(2024, 1, 7), "other")],
        "day date, tag string",
    )
    j = fact.join(dim.where(F.col("tag") == "campaign"), "day").agg(
        F.count("*").alias("n")
    )
    [row] = j.collect()
    assert row.n > 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1200]
