"""TPC-H-shaped analytical queries over the synthetic star schema.

These are the bench headliners: scan-heavy aggregation (Q1 shape),
selective multi-join (Q3 shape), and a 6-table join (Q5 shape). The
reference has no TPC queries — these exercise the same relational
surface (§2.5 agg, §2.7 joins) at benchmarkable scan sizes.

Float determinism: money sums aggregate EXACT integer cents/scaled
longs (the q1 split-accumulator pattern, generalized in r19 — see
_c100/_split_sum/_recombine), recombined and rounded in the decimal
domain on the aggregated groups only, so Spark and the DuckDB oracle
round the identical exact value regardless of partial-agg order.
Columns outside the cents contract (q22's signed c_acctbal) still
aggregate as DECIMAL directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tutorial_spark.plans.catalog import query
from flink_tutorial_spark.session import load_table


def _dec(col):
    """Exact DECIMAL(18,4) element cast — the pre-r19 money pattern,
    kept for the measured exceptions to the cents-long conversion
    (tpch_q14's tiny post-filter aggregate; see _c100)."""
    return F.col(col).cast("decimal(18,4)")


def _c100(col: str) -> F.Column:
    """Exact cents of a 2dp money column as int64.

    The testdata money columns (l_extendedprice, l_discount, l_tax,
    l_quantity, o_totalprice) are exactly representable at 2 decimal
    places (verified: x == CAST(CAST(x AS DECIMAL(18,2)) AS DOUBLE) for
    every row), so round(x*100) recovers the exact cents — the double
    multiply's sub-ulp error is far below the 0.5 rounding margin.
    Sums then accumulate as plain longs inside whole-stage codegen
    instead of per-row Decimal ops (the tpch_q1 split-accumulator
    pattern, measured 3.5x over DECIMAL sums; r19 ports it to the other
    money-sum queries — guide §1.2 per-task work / §2.3 narrower types:
    the pre-projected long also shuffles 8 bytes where the two source
    doubles shuffled 16).

    The conversion is (x*100 + 0.5) truncated, NOT F.round(x*100):
    F.round on a double goes through a per-row BigDecimal allocation,
    and replacing it measured 0.59x on tpch_q1 (r19 interleaved A/B,
    min 0.668 -> 0.393 s at sf0.1). Equivalence needs the money-column
    preconditions that hold for ALL testdata money columns (verified
    per column): non-negative (truncation == floor) and exactly 2dp
    (the double-multiply error is sub-ulp, orders of magnitude below
    the 0.5 margin), so floor(x*100 + 0.5) is the exact cents value —
    verified row-for-row equal to the round() form on every money
    column at sf0.1."""
    return (F.col(col) * 100 + F.lit(0.5)).cast("long")


def _recombine(hi: str, lo: str, frac: str, p: int, s: int, round_to: int = 2) -> F.Column:
    """Recombine a split-accumulator (hi, lo) long pair in the DECIMAL
    domain and round there, so Spark and the DuckDB oracle round the
    identical exact value (see tpch_q1's money(); overflow bounds in
    its docstring hold for every site using this)."""
    return F.round(
        F.col(hi).cast("decimal(24,0)")
        + F.col(lo).cast("decimal(30,0)") * F.lit(frac).cast(f"decimal({p},{s})"),
        round_to,
    ).cast("double")


def _split_sum(col: str, scale: int, prefix: str) -> list[F.Column]:
    """The two long aggregates of a split-accumulator sum of `col`
    (an integer-scaled long column): sum(col div scale) as {prefix}_hi
    and sum(col % scale) as {prefix}_lo. hi + lo/scale == sum(col)/scale
    exactly (per-row: v == (v div s)*s + v % s, also for negatives)."""
    return [
        F.expr(f"sum(`{col}` div {scale})").alias(f"{prefix}_hi"),
        F.expr(f"sum(`{col}` % {scale})").alias(f"{prefix}_lo"),
    ]


@query(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100, 2) AS sum_qty,
       CAST(round(CAST(sum(ep100 // 100) AS DECIMAL(24,0))
             + CAST(sum(ep100 % 100) AS DECIMAL(30,0)) * CAST(0.01 AS DECIMAL(3,2)), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(CAST(sum(disc // 10000) AS DECIMAL(24,0))
             + CAST(sum(disc % 10000) AS DECIMAL(30,0)) * CAST(0.0001 AS DECIMAL(5,4)), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(CAST(sum(charge // 1000000) AS DECIMAL(24,0))
             + CAST(sum(charge % 1000000) AS DECIMAL(30,0)) * CAST(0.000001 AS DECIMAL(7,6)), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*), 4) AS avg_qty,
       round(CAST(sum(d100) AS DOUBLE) / 100 / count(*), 4) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM (
    SELECT l_returnflag, l_linestatus, l_quantity,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS ep100,
           CAST(round(l_discount * 100) AS BIGINT) AS d100,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS disc,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))
             * (100 + CAST(round(l_tax * 100) AS BIGINT)) AS charge
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
""",
    tags=("tpch", "bench"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-pass scan + 8 aggregates over 2 keys.

    The filter pushes to the parquet scan; all aggs compute in one
    partial+final hash aggregate pair (one shuffle of ~6 groups).

    Money sums use split-accumulator scaled-long arithmetic (the
    ROADMAP scaled-integer item; measured 3.5x over DECIMAL sums,
    which allocate a Decimal per row): each 2-dp input scales exactly
    to int64 (round(x*100)), products stay integers (scale 1e4 / 1e6),
    and every sum accumulates as a (value div scale, value mod scale)
    LONG pair inside whole-stage codegen. Overflow bounds at 100 TB
    (~6e11 lineitem rows): hi-sums <= 6e11 * 1.3e5 ~ 8e16, lo-sums
    <= 6e11 * 1e6 = 6e17 — both far under 2^63. The hi/lo pairs
    recombine in DECIMAL on the ~6 output groups only, rounded in the
    decimal domain before the double cast so both engines round
    identically. avgs divide the exact long sums in DOUBLE — the same
    IEEE ops in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    # r19: cents via _c100's cheap cast instead of F.round's per-row
    # BigDecimal (measured 0.59x on this query; row-identical values)
    ep100 = _c100("l_extendedprice")
    d100 = _c100("l_discount")
    tp100 = F.lit(100) + _c100("l_tax")
    dm100 = F.lit(100) - d100
    pre = (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            _c100("l_quantity").alias("q100"),
            ep100.alias("ep100"),
            d100.alias("d100"),
            (ep100 * dm100).alias("disc"),
            (ep100 * dm100 * tp100).alias("charge"),
        )
    )

    def money(prefix: str, scale: int, frac: str, p: int, s: int) -> F.Column:
        return (
            F.round(
                F.col(f"_{prefix}_hi").cast("decimal(24,0)")
                + F.col(f"_{prefix}_lo").cast("decimal(30,0)")
                * F.lit(frac).cast(f"decimal({p},{s})"),
                2,
            )
            .cast("double")
        )

    agg = pre.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("q100").alias("_sq"),
        F.expr("sum(ep100 div 100)").alias("_bp_hi"),
        F.expr("sum(ep100 % 100)").alias("_bp_lo"),
        F.expr("sum(disc div 10000)").alias("_dp_hi"),
        F.expr("sum(disc % 10000)").alias("_dp_lo"),
        F.expr("sum(charge div 1000000)").alias("_ch_hi"),
        F.expr("sum(charge % 1000000)").alias("_ch_lo"),
        F.sum("d100").alias("_sd"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq").cast("double") / 100, 2).alias("sum_qty"),
        money("bp", 100, "0.01", 3, 2).alias("sum_base_price"),
        money("dp", 10000, "0.0001", 5, 4).alias("sum_disc_price"),
        money("ch", 1000000, "0.000001", 7, 6).alias("sum_charge"),
        F.round(F.col("_sq").cast("double") / 100 / F.col("count_order"), 4).alias("avg_qty"),
        F.round(F.col("_sd").cast("double") / 100 / F.col("count_order"), 4).alias("avg_disc"),
        "count_order",
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact-fact-dim join + top-10 by revenue.

    customer (filtered) is broadcast; orders⋈lineitem shuffles on the
    order key. The LIMIT folds into a TakeOrderedAndProject — no full
    sort of the aggregate output.

    r19: revenue = ep*(1-d) is pre-projected as one scaled long
    (cents * (100-d100), scale 1e4) BEFORE the join — the shuffle
    carries 8 bytes instead of the two source doubles (guide §2.3),
    and the sum runs as the q1 split-accumulator long pair instead of
    DECIMAL(37,8) per-row ops, recombined and rounded in the decimal
    domain (bit-identical to the oracle's decimal sum — see _c100)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = li.select(
        "l_orderkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select(
            "l_orderkey",
            _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with dim broadcast.

    region/nation/supplier are broadcast (they stay tiny at every SF);
    the only shuffle joins are fact-fact. Catalyst reorders the join
    tree; AQE re-plans if a filtered side turns out broadcastable.

    r19: revenue pre-projected as one scaled long before the joins
    (8 bytes through both fact-fact shuffles instead of two doubles),
    summed as the q1 split-accumulator pair — see _c100/tpch_q3."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select("n_name", _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"))
    )


@query(
    "broadcast_dim_enrich",
    oracle="""
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 20
GROUP BY p.p_brand
""",
    tags=("join", "broadcast"),
)
def broadcast_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim enrichment — BroadcastStateDemo.java:50-130 /
    _11_BroadcastStateFunction.scala:41-50: replicate the small dim to
    every task, join the fact stream against it. Spark-first: an
    explicit broadcast() hint — zero shuffle on the fact side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") <= 20)
    # r19: split-accumulator cents sum (see _c100)
    li = li.select("l_partkey", _c100("l_extendedprice").alias("_ep100"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"), *_split_sum("_ep100", 100, "_e"))
        .select(
            "p_brand",
            "cnt",
            _recombine("_e_hi", "_e_lo", "0.01", 3, 2).alias("sum_price"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("tpch", "bench"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — every predicate pushes to the
    scan; the whole query is one codegen stage with a scalar result."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        # r19: ep*d as one scaled long (scale 1e4), split-accumulator
        # summed (see _c100) — the whole query is one codegen stage on
        # long arithmetic
        .select((_c100("l_extendedprice") * _c100("l_discount")).alias("_rev4"))
        .agg(*_split_sum("_rev4", 10000, "_r"), F.count("*").alias("cnt"))
        .select(
            _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"),
            "cnt",
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional aggregation (the
    CASE pivot computes both counters in one pass)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
SELECT (100.0 * CAST(round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE))
       / CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast dim join + conditional ratio. Both
    sums aggregate as exact decimals; the final ratio divides the two
    exact doubles identically in both engines."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    # r19: measured EXCEPTION to the cents-long conversion — the
    # one-month shipdate filter leaves so few agg input rows that the
    # extra projection stage outweighed the Decimal cost (interleaved
    # A/B: converted form 1.12x SLOWER at sf0.1), so this query keeps
    # the decimal formulation (OPTIMIZATION_r19.md "tpch_q14")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.round(F.sum(promo), 2).cast("double"))
                / F.round(F.sum(rev), 2).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    tags=("tpch", "join", "outer"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join + two-level aggregation — the
    outer join keeps zero-order customers (count(col) skips nulls), then
    the distribution histogram re-aggregates. Two shuffles total."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "semi_join_active_customers",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000
)
""",
    tags=("tpch", "join", "semi"),
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — SURVEY §2.7 notes the reference has no
    semi joins and Spark gives them free: customers with at least one
    large order, no duplication from multiple matches, right side never
    materialized into the output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_inactive_customers",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
""",
    tags=("tpch", "join", "anti"),
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — TPC-H Q22 shape: customers with no
    urgent orders. The anti join is the relational core of every
    'never-seen' / churn query; Catalyst plans it as a broadcast or
    shuffled anti join with no right-side output columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
SELECT s.s_name, p.p_partkey, l.l_extendedprice
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE p.p_size = 10
  AND l.l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-subquery — the cheapest offer per
    part. Catalyst decorrelates the scalar subquery into an aggregate +
    join (visible in the plan as a second lineitem scan + groupBy), the
    classic optimizer transformation the SURVEY notes comes free."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") == 10)
    s = load_table(spark, sf_dir, "supplier")
    min_price = li.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            min_price,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select("s_name", "p_partkey", "l_extendedprice")
    )


@query(
    "rollup_revenue",
    oracle="""
SELECT c.c_mktsegment, o.o_orderstatus,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS cnt
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY ROLLUP(c.c_mktsegment, o.o_orderstatus)
""",
    tags=("sql", "rollup"),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — beyond the reference (SURVEY §2.5 notes
    grouping sets are absent there and free in Spark): segment/status
    subtotals + grand total in one pass (partial-agg per grouping set)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # r19: o_totalprice summed as the split-accumulator cents pair
    # (see _c100) — the rollup's per-grouping-set partial aggs run on
    # longs instead of per-row Decimal ops
    o = o.select("o_custkey", "o_orderstatus", _c100("o_totalprice").alias("_tp100"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .rollup("c_mktsegment", "o_orderstatus")
        .agg(
            *_split_sum("_tp100", 100, "_t"),
            F.count("*").alias("cnt"),
        )
        .select(
            "c_mktsegment",
            "o_orderstatus",
            _recombine("_t_hi", "_t_lo", "0.01", 3, 2).alias("revenue"),
            "cnt",
        )
    )


@query(
    "segment_top_customers",
    oracle="""
WITH cust_rev AS (
    SELECT c.c_mktsegment, c.c_custkey,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment, c.c_custkey
)
SELECT c_mktsegment, c_custkey, revenue,
       CAST(row_number() OVER (
           PARTITION BY c_mktsegment ORDER BY revenue DESC, c_custkey) AS INT) AS rank
FROM cust_rev
QUALIFY rank <= 3
""",
    tags=("join", "topn"),
)
def segment_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by revenue per market segment — the HotItems
    ranking pattern (HotItems.scala:107-133) applied to a join output."""
    from flink_tutorial_spark.operators.topn import top_n_per_group

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # r19: split-accumulator cents sum (see _c100)
    o = o.select("o_custkey", _c100("o_totalprice").alias("_tp100"))
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(*_split_sum("_tp100", 100, "_t"))
        .select(
            "c_mktsegment",
            "c_custkey",
            _recombine("_t_hi", "_t_lo", "0.01", 3, 2).alias("revenue"),
        )
    )
    return top_n_per_group(
        rev,
        partition_cols=["c_mktsegment"],
        order_col="revenue",
        n=3,
        tiebreak_cols=["c_custkey"],
    ).select("c_mktsegment", "c_custkey", "revenue", "rank")


@query(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral nation-pair trade volume by year — the
    multi-dim join-ordering stress (VERDICT r1 #8). Both nation sides
    broadcast pre-filtered to the two nations, so supplier and customer
    shrink BEFORE touching the facts; the only shuffle joins are
    lineitem⋈orders and ⋈customer. The disjunctive pair predicate is
    evaluated post-join on broadcast columns (codegen, no extra pass)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    pair = ("NATION_1", "NATION_2")
    n1 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    # r19: revenue pre-projected as one scaled long (see _c100/tpch_q3)
    li = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    return (
        li.join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))),
                li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")),
              o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
WITH flat AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS volume,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       CAST(round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
       / CAST(round(sum(volume), 2) AS DOUBLE) AS mkt_share
FROM flat
GROUP BY o_year
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share inside a region — the
    8-table join with TWO roles for nation (customer-side region filter,
    supplier-side share attribution). All dims broadcast; the fact spine
    (lineitem⋈orders) is the only shuffle pair. Share = exact decimal
    sums, one double division at the end (Q14 parity pattern)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # r19: volume pre-projected as one scaled long (see _c100/tpch_q3);
    # the conditional share numerator stays a long too
    li = li.select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_vol4"),
    )
    nation_vol = F.when(
        F.col("supp_nation") == "NATION_2", F.col("_vol4")
    ).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(F.year("o_orderdate").alias("o_year"), F.col("_vol4"),
                nation_vol.alias("_nvol4"))
        .groupBy("o_year")
        .agg(*_split_sum("_nvol4", 10000, "_n"), *_split_sum("_vol4", 10000, "_v"))
        .select(
            "o_year",
            (
                _recombine("_n_hi", "_n_lo", "0.0001", 5, 4)
                / _recombine("_v_hi", "_v_lo", "0.0001", 5, 4)
            ).alias("mkt_share"),
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
    tags=("tpch", "bench", "join", "semi"),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-IN semi join (VERDICT r1 #8) — orders
    whose total quantity crosses a threshold, re-joined for customer
    detail. The IN subquery plans as a LEFT SEMI join against the
    pre-aggregated keys (one extra scan of lineitem, map-side combined);
    the decimal threshold comparison is exact in both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # r19: quantity as exact hundredths (see _c100); the HAVING
    # threshold q > 300 compares identically as sum(q100) > 30000
    # (both exact), and the detail sum recombines split-accumulator
    # longs in the decimal domain
    li = li.select("l_orderkey", _c100("l_quantity").alias("_q100"))
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("_q100").alias("q100"))
        .where(F.col("q100") > 30000)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_key"), "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(*_split_sum("_q100", 100, "_q"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            _recombine("_q_hi", "_q_lo", "0.01", 3, 2).alias("total_qty"),
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
WITH thresh AS (
    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM customer c, thresh
WHERE c.c_acctbal > thresh.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
    tags=("tpch", "join", "anti", "subquery"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join
    — wealthy customers dormant since 2000, grouped by nation. The
    average threshold is computed as an exact decimal sum over one
    double division (deterministic cross-engine), broadcast as a
    1-row literal join; the anti join never materializes orders columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
    tags=("tpch", "join", "semi"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi residual
    (ship-lag > 30 days stands in for commitdate < receiptdate, absent
    from this schema). Plans as one LEFT SEMI join — equi on the order
    key, the date comparison as the join residual — so lineitem is
    scanned once and never aggregated."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q9_product_type_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(
           CAST(l.l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l.l_discount AS DECIMAL(6,4))
           - CAST(p.p_retailprice AS DECIMAL(12,4)) * CAST(l.l_quantity AS DECIMAL(12,4))
       ), 2) AS DOUBLE) AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year across a
    5-table join (p_retailprice*quantity stands in for the missing
    ps_supplycost). part/supplier/nation broadcast; lineitem joins
    orders on the shuffle spine. Decimal products stay inside the
    38-digit cap ((12,4)x(6,4) and (12,4)x(12,4)) so the subtraction is
    exact in both engines."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    # r19: both products as scaled longs (scale 1e4; see _c100 — the
    # inputs are non-negative exact-2dp, p_retailprice verified too);
    # the per-row difference may be negative, which split_sum handles
    # exactly (v == (v div s)*s + v % s also for negative v)
    li = li.select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
        _c100("l_quantity").alias("_q100"),
    )
    p = p.select("p_partkey", _c100("p_retailprice").alias("_rp100"))
    profit = F.col("_rev4") - F.col("_rp100") * F.col("_q100")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .select("nation", F.year("o_orderdate").alias("o_year"), profit.alias("_pr4"))
        .groupBy("nation", "o_year")
        .agg(*_split_sum("_pr4", 10000, "_p"))
        .select(
            "nation",
            "o_year",
            _recombine("_p_hi", "_p_lo", "0.0001", 5, 4).alias("sum_profit"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("tpch", "bench", "join"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter. lineitem's returnflag filter pushes to the scan; customer
    and nation broadcast; the LIMIT folds to TakeOrderedAndProject
    (tiebreak on c_custkey keeps the hash gate deterministic)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    # r19: revenue pre-projected as one scaled long (see _c100/tpch_q3)
    li = li.select(
        "l_orderkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select(
            "c_custkey",
            "c_name",
            _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
WITH pv AS (
    SELECT l.l_partkey AS ps_partkey,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY 1
), total AS (
    SELECT CAST(sum(value) AS DOUBLE) AS grand FROM pv
)
SELECT pv.ps_partkey, CAST(round(pv.value, 2) AS DOUBLE) AS value
FROM pv, total
WHERE CAST(pv.value AS DOUBLE) > total.grand * 0.001
""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value from one nation's suppliers,
    kept only above a fraction of the grand total (scalar-subquery
    threshold; lineitem value stands in for ps_supplycost*availqty).
    The per-part aggregate computes ONCE to scratch-free reuse: Spark
    plans the grand total as a second aggregation over the same
    exchange; the threshold joins as a 1-row broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    # r19: the 600k-row per-part aggregate runs on split-accumulator
    # longs (see _c100); the exact decimal value is recombined on the
    # ~25k part rows only, where the grand total and threshold compare
    # the identical exact values
    li = li.select("l_suppkey", "l_partkey", _c100("l_extendedprice").alias("_ep100"))
    pv = (
        li.join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(*_split_sum("_ep100", 100, "_e"))
        .select(
            "ps_partkey",
            (
                F.col("_e_hi").cast("decimal(24,0)")
                + F.col("_e_lo").cast("decimal(30,0)") * F.lit("0.01").cast("decimal(3,2)")
            ).alias("value_dec"),
        )
    )
    total = pv.agg(F.sum("value_dec").cast("double").alias("grand"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value_dec").cast("double") > F.col("grand") * 0.001)
        .select("ps_partkey", F.round("value_dec", 2).cast("double").alias("value"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, rev.total_revenue
FROM supplier s
JOIN rev ON s.s_suppkey = rev.supplier_no
WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + max scalar subquery (the CREATE
    VIEW step of the spec expressed as a CTE). Ties all emit, so no
    tiebreak is needed for determinism; the max joins as a 1-row
    broadcast against the same aggregate."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    # r19: revenue pre-projected as one scaled long (see _c100/tpch_q3)
    li = li.select(
        "l_suppkey",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    per_supp = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select(
            "supplier_no",
            _recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("total_revenue"),
        )
    )
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    tags=("tpch", "join", "anti"),
)
def tpch_q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class with a
    NOT IN exclusion (negative-balance suppliers stand in for the
    complaints list; lineitem stands in for partsupp). The NOT IN plans
    as a broadcast anti join BEFORE the distinct aggregation, so
    excluded suppliers never enter the count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
WITH pa AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
    FROM lineitem GROUP BY 1
)
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa    ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < 0.2 * pa.avg_qty
""",
    tags=("tpch", "join", "subquery"),
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated average (per-part avg quantity)
    decorrelated into an aggregate-then-join — the Catalyst shape the
    spec's scalar subquery plans to. The average divides an exact
    decimal sum by the count in DOUBLE, the identical IEEE operation in
    both engines, so the 0.2x threshold comparison cannot drift."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    # r19: the full-table per-part average aggregates exact hundredth
    # longs (see _c100); the sum->double path goes through the decimal
    # domain so the divide sees the identical exact value
    pa = (
        li.select("l_partkey", _c100("l_quantity").alias("_q100"))
        .groupBy(F.col("l_partkey").alias("pa_key"))
        .agg(F.sum("_q100").alias("_qs"), F.count("*").alias("_qn"))
        .select(
            "pa_key",
            (
                (
                    F.col("_qs").cast("decimal(30,0)")
                    * F.lit("0.01").cast("decimal(3,2)")
                ).cast("double")
                / F.col("_qn")
            ).alias("avg_qty"),
        )
    )
    return (
        li.select("l_partkey", "l_quantity", _c100("l_extendedprice").alias("_ep100"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(pa, F.col("l_partkey") == F.col("pa_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(*_split_sum("_ep100", 100, "_e"))
        .select(
            (_recombine("_e_hi", "_e_lo", "0.01", 3, 2) / 7.0).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("tpch", "join"),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses across the join (the OR-of-ANDs Catalyst pushes partially
    to each side: the common p_size>=1 and quantity bounds prune the
    scans, the mixed residual evaluates post-join in codegen)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # r19: revenue pre-projected as one scaled long (see _c100/tpch_q3)
    li = li.select(
        "l_partkey",
        "l_quantity",
        (_c100("l_extendedprice") * (F.lit(100) - _c100("l_discount"))).alias("_rev4"),
    )
    clause = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#7") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(clause)
        .agg(*_split_sum("_rev4", 10000, "_r"))
        .select(_recombine("_r_hi", "_r_lo", "0.0001", 5, 4).alias("revenue"))
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_4'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS DECIMAL(18,4))) > 100
  )
""",
    tags=("tpch", "join", "semi", "subquery"),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi join — suppliers in one nation who
    shipped >100 units of matching parts in a year (the partsupp
    half-availqty threshold re-expressed over lineitem). The inner
    HAVING aggregate reduces to a key set; both the IN and the nation
    filter plan as broadcast semi/inner joins with no row explosion."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    # r19: the HAVING threshold compares identically on exact hundredth
    # longs — sum(q100) > 10000 ⟺ sum(decimal q) > 100 (see _c100)
    shippers = (
        li.select("l_partkey", "l_suppkey", _c100("l_quantity").alias("_q100"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("_q100").alias("q100"))
        .where(F.col("q100") > 10000)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(shippers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21_suppliers_who_kept_waiting",
    oracle="""
WITH pairs AS (
    SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
), late AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM pairs p2
              WHERE p2.l_orderkey = l1.l_orderkey AND p2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    tags=("tpch", "join", "semi", "anti"),
)
def tpch_q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order (ship-lag > 90 days stands in for
    receipt-after-commit).

    The EXISTS + NOT EXISTS pair is rewritten as per-order counts —
    "another supplier exists" == n_suppliers > 1, "no other late
    supplier" == n_late == 1 (the candidate itself, whose key min()
    recovers). The rewrite beats the literal semi/anti double self-join
    measured (1.21s vs 1.59s at sf0.1) and ships one aggregated row per
    order into the join instead of every (order, supplier) pair — the
    dominant term at 100 TB. The literal semi/anti shape stays
    demonstrated by semi_join_active_customers /
    anti_join_inactive_customers."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_all = pairs.groupBy("l_orderkey").agg(F.count("*").alias("n_all"))
    lstat = late.groupBy("l_orderkey").agg(
        F.count("*").alias("n_late"), F.min("l_suppkey").alias("suppkey")
    )
    return (
        lstat.join(n_all, "l_orderkey")
        .where((F.col("n_all") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )
