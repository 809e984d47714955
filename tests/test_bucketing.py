"""Bucketed co-located join: THE scale technique for repeated fact-fact
joins (SCALING.md 'Joins'). Writing both tables bucketed on the join key
lets Catalyst drop both shuffle exchanges — at 100 TB that's the
difference between a map-side join and an 80 TB network transfer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tutorial_spark.session import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a catalog; the session's default warehouse works
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_drops_exchanges(spark, sf_dir, warehouse):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("b_orders"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("b_lineitem"))

    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    joined.collect()
    # the join itself must not introduce a shuffle: with both sides
    # bucketed on the key, no Exchange may appear BELOW the join
    join_pos = max(plan.find("SortMergeJoin"), plan.find("ShuffledHashJoin"))
    if join_pos >= 0:
        below_join = plan[join_pos:]
        assert "Exchange hashpartitioning(l_orderkey" not in below_join
        assert "Exchange hashpartitioning(o_orderkey" not in below_join

    # result equals the unbucketed join
    want = {
        (r.o_orderstatus, r.cnt)
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus").agg(F.count("*").alias("cnt")).collect()
    }
    got = {(r.o_orderstatus, r.cnt) for r in joined.collect()}
    assert got == want
