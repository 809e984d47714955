"""Physical-plan audits: the optimizations the 100 TB design depends on
must actually appear in the executed plans — filter pushdown into the
parquet scan, column pruning, broadcast joins for dims, whole-stage
codegen. Guards against silent plan regressions (e.g. a cast or UDF
that breaks pushdown)."""

from __future__ import annotations

import re

import pytest

from flink_tutorial_spark import plans


def formatted_plan(spark, name, sf_dir) -> str:
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = formatted_plan(spark, "filter_select", sf_dir)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(event_type,purchase)" in pushed
    assert "GreaterThan(value,50.0)" in pushed


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = formatted_plan(spark, "project_tuple", sf_dir)
    read = re.search(r"ReadSchema: (.*)", plan).group(1)
    # only the 3 projected columns, not all 11 lineitem columns
    assert read.count(":") == 3, read


def test_date_filter_pushdown_tpch_q1(spark, sf_dir):
    plan = formatted_plan(spark, "tpch_q1_pricing_summary", sf_dir)
    assert "LessThanOrEqual(l_shipdate" in plan
    read = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert "l_orderkey" not in read  # unused columns pruned


def test_dim_joins_are_broadcast(spark, sf_dir):
    for name in ["broadcast_dim_enrich", "tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume"]:
        plan = formatted_plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        # dims must never arrive via a full shuffle join at test SF
        assert "ShuffledHashJoin" not in plan, name


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE only finalizes codegen stages at execution time — materialize,
    # then inspect the executed plan for fused WholeStageCodegen spans
    df = plans.REGISTRY["tpch_q1_pricing_summary"].fn(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # '*(N) HashAggregate' markers == WholeStageCodegen-fused stages
    assert re.search(r"\*\(\d+\) HashAggregate", executed), executed[:500]


def test_no_python_udf_in_relational_plans(spark, sf_dir):
    # every reference-surface operator must stay JVM-side; pandas UDFs
    # are reserved for the stateful/multimodal layer
    # similarity_topk is intentionally absent: its scorer is a sanctioned
    # vectorized mapInPandas (BLAS matmul), not a row-at-a-time UDF
    for name in [
        "hot_items_topn", "keyed_sum", "session_window_gap", "interval_join",
        "dedup_minhash_lsh", "text_quality",
    ]:
        plan = formatted_plan(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_tpch_semi_anti_shapes(spark, sf_dir):
    # Q4's EXISTS and Q18's HAVING-IN must plan as semi joins (no row
    # explosion), Q16/Q21/Q22's NOT IN / NOT EXISTS as anti joins
    for name, marker in [
        ("tpch_q4_order_priority", "LeftSemi"),
        ("tpch_q18_large_volume_customer", "LeftSemi"),
        ("tpch_q16_supplier_part_count", "LeftAnti"),
        ("tpch_q22_global_sales_opportunity", "LeftAnti"),
    ]:
        plan = formatted_plan(spark, name, sf_dir)
        assert marker in plan, name
    # Q21 is decorrelated (r6): the EXISTS/NOT-EXISTS pair becomes two
    # per-order aggregates joined on orderkey — no pair-level semi/anti
    # joins remain, and the supplier name lookup stays broadcast
    q21 = formatted_plan(spark, "tpch_q21_suppliers_who_kept_waiting", sf_dir)
    assert "LeftSemi" not in q21 and "LeftAnti" not in q21
    assert "BroadcastHashJoin" in q21


def test_tpch_wide_joins_broadcast_dims(spark, sf_dir):
    # the 5-8 table joins must broadcast every dim: exactly zero
    # SortMergeJoins on a dim side at test SF (the fact spine may SMJ)
    for name in [
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "tpch_q9_product_type_profit", "tpch_q10_returned_items",
    ]:
        plan = formatted_plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name


def test_tpch_topn_fold_to_take_ordered(spark, sf_dir):
    # ORDER BY + LIMIT must fold to TakeOrderedAndProject — a full sort
    # of the aggregate output would shuffle everything at 100 TB
    for name in ["tpch_q10_returned_items", "tpch_q21_suppliers_who_kept_waiting"]:
        plan = formatted_plan(spark, name, sf_dir)
        assert "TakeOrderedAndProject" in plan, name


def test_training_shards_plan_shape(spark, sf_dir):
    # the end-to-end pipeline must fuse to scan + semi-join dedup +
    # per-bucket window with NO Python in the plan (every stage is
    # codegen expressions) and no global single-partition sort
    plan = formatted_plan(spark, "datapipe_training_shards", sf_dir)
    assert "LeftSemi" in plan, "dedup keep-list should plan as a semi join"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the pack window partitions by bucket (parallel); a global cumsum
    # would need an Exchange SinglePartition — the scale-killer shape
    assert "hashpartitioning(bucket" in plan
    assert "SinglePartition" not in plan


def test_udaf_is_arrow_grouped_agg(spark, sf_dir):
    # the one sanctioned Python UDF in the relational catalog must run
    # as an Arrow GROUPED_AGG (AggregateInPandas), never row-at-a-time
    plan = formatted_plan(spark, "udaf_weighted_avg", sf_dir)
    # Spark 4.1 physical node name; older releases say AggregateInPandas
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan, plan[:800]
    assert "BatchEvalPython" not in plan


def test_aqe_skew_join_rewrite(spark):
    """AQE's skew-join split is live at runtime: a hot-key join replans
    as SortMergeJoin(skew=true) once the skewed-partition thresholds are
    crossed — the engine's first line of defense at 100 TB before manual
    salting (operators/partitioning.two_stage_count). Also pins the
    known AQE constraint: a downstream aggregate on the join key reuses
    the join's partitioning, so the skew split is (correctly) skipped
    there — THAT shape is what the salting fallback is for."""
    import pyspark.sql.functions as F

    conf = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 3 != 0, 0).otherwise(F.col("id") % 101).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        j = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")).alias("s"))
        [row] = j.collect()
        assert row.s is not None
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan

        # partition-reuse suppression: aggregate on the join key after
        # the join -> AQE must NOT split (it would force a re-shuffle)
        g = left.join(right, "k").groupBy("k").agg(F.count("*").alias("n"))
        g.collect()
        gplan = g._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in gplan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sequence_packing_no_global_sort(spark, sf_dir):
    # the packing cumsum must window per WRITER partition — a global
    # (single-partition) Sort/Window would serialize the corpus
    plan = formatted_plan(spark, "datapipe_sequence_packing", sf_dir)
    assert "SinglePartition" not in plan, plan[:800]
    assert re.search(r"hashpartitioning\(writer", plan), plan[:800]


def test_tfidf_df_table_joins_broadcast(spark, sf_dir):
    # the term-df table and the 1-row doc count must broadcast; the only
    # shuffles are the two partial-aggregable groupBys + the rank window
    plan = formatted_plan(spark, "text_tfidf_top_terms", sf_dir)
    assert plan.count("BroadcastExchange") >= 2, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]


def test_bigram_lm_count_tables_broadcast(spark, sf_dir):
    # the c12/c1 probability tables must broadcast onto the per-doc
    # transition rows; no sort-merge join anywhere in the plan
    plan = formatted_plan(spark, "text_bigram_lm", sf_dir)
    assert plan.count("BroadcastExchange") >= 2, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]


def test_chunk_dedup_stays_jvm_side(spark, sf_dir):
    # chunk explode + ownership min-agg + join-back: all JVM expressions
    plan = formatted_plan(spark, "text_chunk_dedup", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert "ArrowEvalPython" not in plan, plan[:800]


def test_bpe_merges_aggregates_off_vocab(spark, sf_dir):
    # pair counts explode off the DISTINCT vocabulary (post-aggregation),
    # never the raw corpus: the explode generator must sit above the
    # word-frequency HashAggregate, and everything stays JVM-side
    plan = formatted_plan(spark, "text_bpe_merges", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    import re as _re

    nodes = [
        _re.match(r"\s*\(\d+\) (\w+)", line).group(1)
        for line in plan.splitlines()
        if _re.match(r"\s*\(\d+\) \w+", line)
    ]
    gens = [i for i, n in enumerate(nodes) if n == "Generate"]
    aggs = [i for i, n in enumerate(nodes) if n == "HashAggregate"]
    assert len(gens) >= 2, nodes
    assert min(aggs) < gens[1], nodes  # pair explode sits above the vocab agg


def test_asof_join_single_shuffle_no_blowup(spark, sf_dir):
    # the union+window as-of formulation must plan as ONE key shuffle —
    # never a range join (BroadcastNestedLoop/Cartesian) and never Python
    plan = formatted_plan(spark, "join_asof_attribution", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]
    # exactly two shuffles: the view-dedup agg on (user_id, ts) and the
    # as-of window's single-key partition on user_id
    assert len(re.findall(r"hashpartitioning\(user_id#\d+L, \d+\)", plan)) == 1, plan[:1200]
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 2, plan[:1200]


def test_quality_sampling_zero_shuffle(spark, sf_dir):
    # seeded-hash sampling is pure map-side column work: NO Exchange of
    # any kind in the plan, and only the 2 needed columns scanned
    plan = formatted_plan(spark, "datapipe_quality_sampling", sf_dir)
    assert "Exchange" not in plan, plan[:800]
    read = re.search(r"ReadSchema: (.*)", plan).group(1)
    assert read.count(":") == 2, read  # doc_id, text


def test_substring_dedup_stays_jvm_side(spark, sf_dir):
    # gram explode + hash + ownership + interval union: all JVM exprs
    plan = formatted_plan(spark, "text_substring_dedup", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert "ArrowEvalPython" not in plan, plan[:800]


def test_pagerank_stays_jvm_side_no_cartesian(spark, sf_dir):
    # fixed-point PageRank: rank/edge joins must plan as hash/merge
    # joins (never a cartesian over edges) with zero Python in the loop
    plan = formatted_plan(spark, "graph_pagerank", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert "ArrowEvalPython" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]


def test_triangle_stats_oriented_joins_jvm_side(spark, sf_dir):
    # degree-ordered orientation: wedge + closing-edge joins are equi-
    # joins (hash/merge), never a cartesian over the edge set; the only
    # nested-loop joins are the 1-row stat-aggregate crossJoins
    plan = formatted_plan(spark, "graph_triangle_stats", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]


def test_gap_fill_single_events_pass_no_python(spark, sf_dir):
    # the bucket table is scratch-materialized, so the final plan reads
    # ONLY the (tiny) bucket parquet — the events scan happened exactly
    # once, at materialization time, not once per grid/span/join branch
    plan = formatted_plan(spark, "timeseries_gap_fill", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    reads = re.findall(r"ReadSchema: (.*)", plan)
    # every scan in the final plan is of bucket-table columns, never the
    # raw events columns (ts/value/props)
    assert reads, plan[:800]
    assert all("ts:" not in r and "value:" not in r for r in reads), reads


def test_scd2_reuses_one_user_sort_shuffle(spark, sf_dir):
    # lag-filter + lead/row_number share the (user_id, ts, event_id)
    # sort order: the plan must contain exactly ONE exchange (the
    # user_id hash partition) reused by both window groups
    plan = formatted_plan(spark, "scd2_item_intervals", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan[:1500]


def test_path_topk_folds_to_take_ordered(spark, sf_dir):
    # the top-20 must be a TakeOrderedAndProject fold (partial top-k per
    # partition), never a single-partition global sort of the path table
    plan = formatted_plan(spark, "session_path_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]


def test_rfm_no_global_sort_boundary_scoring(spark, sf_dir):
    # quartile scoring must be boundary comparison (1-row agg broadcast
    # back), not ntile's single-partition Window sort over all customers
    plan = formatted_plan(spark, "rfm_segments", sf_dir)
    assert "Window" not in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row quartile join


def test_anomaly_rolling_window_bucket_sized(spark, sf_dir):
    # the rolling stats window partitions by event_type over BUCKET rows;
    # the only exchanges are the bucket agg + the window partition
    plan = formatted_plan(spark, "timeseries_anomaly", sf_dir)
    assert "BatchEvalPython" not in plan, plan[:800]
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2, plan[:1500]


@pytest.mark.slow
def test_catalog_wide_plan_audit(spark, sf_dir):
    """Whole-catalog plan linter: NO batch query may contain a
    row-at-a-time Python eval (BatchEvalPython — the 10-100x slow path;
    vectorized Arrow ops are separately sanctioned per query) or a
    CartesianProduct (1-row broadcast aggregates plan as
    BroadcastNestedLoopJoin, so any CartesianProduct is a real
    data-sized cross join). Streaming queries execute on call and are
    audited by their own tests."""
    from flink_tutorial_spark import plan_capture

    bad = []
    plan_capture.enable()
    try:
        for name, spec in plans.REGISTRY.items():
            if name.startswith("streaming_"):
                continue
            plan_capture.drain()
            try:
                plan = formatted_plan(spark, name, sf_dir)
            except Exception as e:  # pragma: no cover - audit must see all
                bad.append((name, f"plan build failed: {e}"))
                continue
            # full lineage (r13 blind spot): the final plan PLUS every
            # pre-truncation capture — localCheckpoint loop bodies,
            # scratch-parquet writes, sink merges, and the executed
            # micro-batch plans of live queries hiding behind memory
            # sinks (cep_* run streams despite the batch-looking name)
            plans_to_check = [("final", plan)] + plan_capture.drain()
            for lbl, pl in plans_to_check:
                if "BatchEvalPython" in pl:
                    bad.append((name, lbl, "BatchEvalPython"))
                if "CartesianProduct" in pl:
                    bad.append((name, lbl, "CartesianProduct"))
    finally:
        plan_capture.disable()
    assert not bad, bad


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime bloom-filter injection (Spark 3.3+): a selective filter
    on one join side should inject a bloom_filter_might_contain guard
    into the other side's scan, cutting shuffle volume before the join
    — the third runtime defense at 100 TB next to AQE skew splitting
    (test_aqe_skew_join_rewrite) and DPP (test_partition_pruning).
    Production thresholds (10 GB application side) are lowered to fire
    at test SF."""
    import pyspark.sql.functions as F

    from flink_tutorial_spark.session import load_table

    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        # Spark 4.1 names: might_contain guard on the application side,
        # bloom_filter_agg building the filter from the selective side
        assert "might_contain" in plan, plan[:1500]
        assert "bloom_filter_agg" in plan, plan[:1500]
        [row] = j.collect()
        assert row.n > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_repetition_profile_zero_shuffle(spark, sf_dir):
    # per-row array lambdas only: no Exchange of any kind, and the
    # staged selects must not collapse back into per-element re-splits
    plan = formatted_plan(spark, "text_repetition_profile", sf_dir)
    assert "Exchange" not in plan, plan[:800]


def test_decontamination_broadcast_only(spark, sf_dir):
    # benchmark gram set broadcasts; the corpus side never shuffles for
    # the overlap join (only the per-doc count agg exchanges)
    plan = formatted_plan(spark, "datapipe_decontamination", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "CartesianProduct" not in plan, plan[:800]
    assert "SortMergeJoin" not in plan, plan[:800]


def test_bpe_encode_broadcast_vocab(spark, sf_dir):
    # the encoded vocabulary joins back to the corpus word stream as a
    # broadcast; the learn loop's actions already ran at plan build
    plan = formatted_plan(spark, "text_bpe_encode", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]


def test_pii_scrub_map_side_only(spark, sf_dir):
    # derived marker fixture + regex scrub: pure column work, no shuffle
    plan = formatted_plan(spark, "text_pii_scrub", sf_dir)
    assert "Exchange" not in plan, plan[:800]
    assert "BatchEvalPython" not in plan, plan[:800]


def test_plan_capture_sees_through_materialization(spark, sf_dir):
    """r13 blind spot closed: queries that materialize mid-flight must
    hand the linter their REAL plans. Three truncation mechanisms, one
    representative each: a live query behind a memory sink whose name
    lacks the streaming_ prefix (cep_chain3 — the census treated it as
    batch and saw only a memory scan), a localCheckpoint iteration loop
    (graph_pagerank), and a scratch-parquet write+reread
    (dedup_connected_components)."""
    from flink_tutorial_spark import plan_capture

    def captures_of(name):
        plan_capture.enable()
        try:
            plans.REGISTRY[name].fn(spark, sf_dir)
            return plan_capture.drain()
        finally:
            plan_capture.disable()

    caps = captures_of("cep_chain3")
    stream_caps = [p for lbl, p in caps if lbl.startswith("stream:")]
    assert stream_caps, [lbl for lbl, _ in caps]
    # the executed micro-batch plan, not a memory-table scan: the
    # pattern-match work (window/agg or pandas op) must be visible
    assert any("Scan ExistingRDD" not in p or len(p) > 200 for p in stream_caps)
    assert all("BatchEvalPython" not in p for p in stream_caps)

    caps = captures_of("graph_pagerank")
    ckpt = [p for lbl, p in caps if lbl.startswith("ckpt:")]
    assert ckpt, [lbl for lbl, _ in caps]
    # the loop body's join+agg is in the captured plans
    assert any("Join" in p or "Aggregate" in p for p in ckpt)
    assert all("BatchEvalPython" not in p and "CartesianProduct" not in p for p in ckpt)

    caps = captures_of("dedup_connected_components")
    scratch = [p for lbl, p in caps if lbl.startswith("scratch:")]
    assert scratch, [lbl for lbl, _ in caps]
    assert all("BatchEvalPython" not in p and "CartesianProduct" not in p for p in scratch)

    # disabled by default: hooks are no-ops and nothing leaks
    assert not plan_capture.enabled()


def test_plan_capture_drain_is_noop_when_disabled():
    """ADVICE r14: drain() on a DISABLED registry must return [] without
    arming capture — a stray drain() in a long-lived process would
    otherwise start unbounded plan-string accumulation."""
    from flink_tutorial_spark import plan_capture

    plan_capture.disable()
    assert plan_capture.drain() == []
    assert not plan_capture.enabled()
    # and the hooks stay no-ops
    plan_capture.capture_text("some plan", "label")
    assert plan_capture.drain() == []
    assert not plan_capture.enabled()
