"""Focused tests for the r19 exact-cents aggregation internals
(queries_tpch._c100/_split_sum/_recombine, parity.dec_sum/dec_avg,
operators.dedup.simhash bit-sum reformulation).

The catalog oracle tests prove end-to-end parity; these pin the
OPERATOR-LEVEL equivalences the r19 optimizations rely on, so a future
edit that breaks a precondition fails here with a named reason instead
of as an opaque hash mismatch."""

from __future__ import annotations

from functools import reduce

import pytest
from pyspark.sql import functions as F

from flink_tutorial_spark.plans.queries_tpch import _c100, _recombine, _split_sum
from flink_tutorial_spark.plans.parity import dec_avg, dec_sum
from flink_tutorial_spark.session import load_table

MONEY_COLS = [
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("lineitem", "l_quantity"),
    ("orders", "o_totalprice"),
    ("part", "p_retailprice"),
    ("events", "value"),
]


@pytest.mark.parametrize("table,col", MONEY_COLS)
def test_c100_equals_rounded_cents_on_testdata(spark, sf_dir, table, col):
    """The cheap (x*100 + 0.5) cast equals F.round(x*100) row-for-row on
    every money column — the precondition (non-negative, exact 2dp)
    holds in the testdata. If a future generation violates it, this
    names the column instead of a bench-time hash mismatch."""
    df = load_table(spark, sf_dir, table)
    bad = df.where(
        F.col(col).isNotNull()
        & (_c100(col) != F.round(F.col(col) * 100).cast("long"))
    ).count()
    assert bad == 0
    neg = df.where(F.col(col) < 0).count()
    assert neg == 0, f"{table}.{col} has negatives — outside _c100's contract"
    # The exact-2dp precondition itself (ADVICE r19): both forms above
    # agree even on >2dp values (x=1.005 -> 100 both ways), so check
    # representability directly — a value is exactly 2dp iff the
    # double->DECIMAL(18,2)->double round-trip is the identity.
    not_2dp = df.where(
        F.col(col).isNotNull()
        & (F.col(col) != F.col(col).cast("decimal(18,2)").cast("double"))
    ).count()
    assert not_2dp == 0, f"{table}.{col} has >2dp values — outside _c100's contract"


def test_cents_sum_rejects_unlisted_columns():
    """dec_sum/dec_avg are restricted by construction (ADVICE r19): a
    column outside the proven allowlist fails at plan build, not as a
    silent truncation-toward-zero wrong answer."""
    with pytest.raises(ValueError, match="cents fast path"):
        dec_sum("c_acctbal")
    with pytest.raises(ValueError, match="cents fast path"):
        dec_avg("c_acctbal")


def test_split_sum_recombine_identity_including_negatives(spark):
    """hi + lo*frac == sum(v)/scale exactly, also for NEGATIVE v (the
    q9 profit case): v == (v div s)*s + v % s per row in Spark."""
    vals = [123456, -987654, 1, -1, 0, 10**12, -(10**12) - 7, 9999, -9999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = (
        df.agg(*_split_sum("v", 10000, "_t"))
        .select(_recombine("_t_hi", "_t_lo", "0.0001", 5, 4, round_to=4).alias("r"))
        .collect()[0]["r"]
    )
    assert got == round(sum(vals) / 10000.0, 4)


def test_dec_sum_long_equals_decimal_formulation(spark, sf_dir):
    """parity.dec_sum's cents-long path == the DECIMAL(18,6) sum it
    replaced, per event_type group on real data."""
    ev = load_table(spark, sf_dir, "events")
    old = F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4).cast("double")
    rows = (
        ev.groupBy("event_type")
        .agg(dec_sum("value").alias("new"), old.alias("old"),
             dec_avg("value").alias("new_avg"),
             F.round(
                 F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                 / F.count("*"), 4).alias("old_avg"))
        .collect()
    )
    assert rows
    for r in rows:
        assert r["new"] == r["old"], r
        assert r["new_avg"] == r["old_avg"], r


def test_simhash_bitsum_equals_vote_sum(spark, sf_dir):
    """The r19 bit-sum fingerprint == the ±1 vote-sum formulation on
    real documents (exact-tie bits included: 2*bits > n ⟺ votes > 0)."""
    from flink_tutorial_spark.operators.dedup import SIMHASH_BITS, md5_long, simhash

    docs = load_table(spark, sf_dir, "documents")
    new = simhash(docs)
    words = docs.select(
        F.col("doc_id"), F.explode(F.split(F.col("text"), " ")).alias("word")
    ).where(F.col("word") != "")
    words = words.select("doc_id", md5_long(F.col("word")).alias("h"))
    h = F.col("h")
    votes = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    fp = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0).cast("long"))
            for i in range(SIMHASH_BITS)
        ],
    )
    old = votes.select(F.col("doc_id"), fp.cast("bigint").alias("simhash_old"))
    diff = (
        new.join(old, "doc_id")
        .where(F.col("simhash") != F.col("simhash_old"))
        .count()
    )
    assert diff == 0
