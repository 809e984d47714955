"""Golden-trace tests for operators outside the oracle catalog:
iterate feedback loop, sliding count window, side-output fan-out,
late-data watermark behavior, bucketize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tutorial_spark.operators.iterate import iterate
from flink_tutorial_spark.operators.transform import bucketize, flat_map
from flink_tutorial_spark.sinks.foreach import split_sinks
from tests.test_streaming import EVENT_SCHEMA, _row, run_stream, write_batches


def test_iterate_golden_trace(spark):
    # IterateDemo.java:58-70: body x-2, feedback while >0, exit at <=0.
    # 10 -> 8 -> ... -> 0 exits at 0; 7 -> 5 -> 3 -> 1 exits at -1.
    df = spark.createDataFrame([(10,), (7,)], ["x"])
    done = iterate(
        df,
        body=lambda d: d.select((F.col("x") - 2).alias("x")),
        exit_filter=F.col("x") <= 0,
    )
    assert sorted(r.x for r in done.collect()) == [-1, 0]


def test_sliding_count_window_golden(spark, tmp_path):
    # CountWindowAllDemo.java:33-41 trace shape: countWindowAll(4, 2) —
    # fire every 2 rows over the last <=4 rows
    from flink_tutorial_spark.streaming.stateful import sliding_count_window_sum

    src = str(tmp_path / "src")
    write_batches(
        src,
        [[_row(i, "k", value=float(v))] for i, v in enumerate([1, 2, 3, 4, 5, 6])],
    )
    got = run_stream(
        spark,
        src,
        lambda s: sliding_count_window_sum(s, "key", "ts", "value", size=4, slide=2),
        "append",
    ).collect()
    fires = {r.emit_seq: (r.cnt, r.sum_value) for r in got}
    assert fires[1] == (2, 3.0)     # [1,2]
    assert fires[2] == (4, 10.0)    # [1,2,3,4]
    assert fires[3] == (4, 18.0)    # [3,4,5,6]


def test_side_output_split(spark, sf_dir):
    # SideOutputDemo.java:22-50: one stream -> tagged sub-streams
    from flink_tutorial_spark.session import load_table

    events = load_table(spark, sf_dir, "events")
    outs = split_sinks(
        events,
        {
            "high": F.col("value") >= 100,
            "low": F.col("value") < 100,
        },
    )
    total = events.count()
    assert outs["high"].count() + outs["low"].count() == total
    assert outs["high"].filter(F.col("value") < 100).count() == 0


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    # WindowLateDateDemo.java:44-56 / _08_lateReadingsOutput: rows behind
    # the watermark are excluded from closed windows; the dual-query
    # audit pattern counts them separately
    # Observed semantics (documented delta, matches Flink's
    # allowedLateness-ish behavior): the watermark computed at a batch's
    # end takes effect next batch, and state eviction happens at the end
    # of that batch — so a late row arriving in the IMMEDIATELY following
    # batch still merges into live state; one batch later it is dropped
    # (numRowsDroppedByWatermark increments).
    src = str(tmp_path / "src")
    write_batches(
        src,
        [
            [_row(1, "a", value=1.0), _row(2, "a", value=1.0)],
            [_row(60, "a", value=1.0)],          # watermark -> 60 after this
            [_row(61, "b", value=1.0)],          # wm=60 in force; [0,5) evicted
            [_row(3, "a", value=100.0)],         # LATE: dropped
            [_row(120, "z", value=1.0)],
        ],
    )

    def q(stream):
        return (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "5 seconds").alias("w"), "key")
            .agg(F.sum("value").alias("total"))
            .select(F.col("w.start").alias("ws"), "key", "total")
        )

    got = {(r.ws.isoformat(), r.key): r.total for r in run_stream(spark, src, q, "append").collect()}
    # the late row's 100.0 must NOT appear in the closed [0,5) window
    assert got[("2024-01-01T00:00:00", "a")] == 2.0


def test_bucketize_boundaries(spark):
    df = spark.createDataFrame([(5.0,), (15.0,), (25.0,), (35.0,)], ["v"])
    out = [r.b for r in df.select(bucketize(F.col("v"), [10, 20, 30]).alias("b")).collect()]
    assert out == [0, 1, 2, 3]


def test_flat_map_explode(spark):
    df = spark.createDataFrame([("a b c",)], ["line"])
    words = flat_map(df, F.split("line", " "), "word")
    assert sorted(r.word for r in words.collect()) == ["a", "b", "c"]


def test_rich_function_lifecycle(spark):
    # RichMapFunction contract (note/01.Souce_and_Sink.md:199-206):
    # open() once per partition before the first batch, close() after
    # the last; map sees the opened resource
    import uuid

    from pyspark.sql import functions as F

    from flink_tutorial_spark.functions import rich_map_in_pandas

    df = spark.range(0, 100).repartition(4)

    def open_fn():
        return {"conn": uuid.uuid4().hex}

    def map_fn(res, pdf):
        pdf = pdf.copy()
        pdf["conn"] = res["conn"]
        return pdf

    out = rich_map_in_pandas(df, "id long, conn string", open_fn, map_fn)
    rows = out.collect()
    assert len(rows) == 100 and all(r.conn for r in rows)
    # one resource per partition, not per row/batch
    assert out.select(F.countDistinct("conn")).first()[0] <= 4


def test_merge_sql_dialects():
    from flink_tutorial_spark.sinks.foreach import _create_target_sql, _merge_sql

    cols, keys = ["k", "ts", "v"], ["k"]
    pg = _merge_sql("t", "s", cols, keys, dialect="postgres")
    assert "DELETE FROM t USING s" in pg and "INSERT INTO t (k, ts, v)" in pg
    my = _merge_sql("t", "s", cols, keys, dialect="mysql")
    assert "ON DUPLICATE KEY UPDATE" in my and "ts = VALUES(ts)" in my
    assert "DELETE" not in my  # the reference's exact MySQL statement shape
    an = _merge_sql("t", "s", cols, keys, dialect="ansi")
    assert an.startswith("MERGE INTO t t USING s s ON (t.k = s.k)")
    assert "WHEN MATCHED THEN UPDATE SET" in an
    assert "WHEN NOT MATCHED THEN INSERT (k, ts, v)" in an
    assert _create_target_sql("t", "s", "ansi") is None  # must pre-exist
    assert "IF NOT EXISTS" in _create_target_sql("t", "s", "mysql")


def _exec_merge_on_duckdb(dialect: str) -> list[tuple]:
    """Execute a dialect branch's generated SQL against live DuckDB:
    seed target {1: old, 2: keep}, stage {1: new, 3: ins}, merge TWICE
    (idempotent-replay contract), return the converged target."""
    import duckdb

    from flink_tutorial_spark.sinks.foreach import _merge_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT, ts INT, v DOUBLE)")
    con.execute("INSERT INTO t VALUES (1, 10, 1.0), (2, 20, 2.0)")
    con.execute("CREATE TABLE s (k INT, ts INT, v DOUBLE)")
    con.execute("INSERT INTO s VALUES (1, 11, 9.0), (3, 30, 3.0)")
    sql = _merge_sql("t", "s", ["k", "ts", "v"], ["k"], dialect=dialect)
    con.execute(f"BEGIN TRANSACTION; {sql} COMMIT;")
    con.execute(f"BEGIN TRANSACTION; {sql} COMMIT;")  # replay: same result
    return con.execute("SELECT k, ts, v FROM t ORDER BY k").fetchall()


def test_merge_postgres_branch_executes_on_duckdb():
    """The postgres-dialect DELETE USING + INSERT pair is live-executed
    (DuckDB shares the USING syntax): updated, kept, and inserted keys
    converge and a replayed epoch changes nothing."""
    assert _exec_merge_on_duckdb("postgres") == [
        (1, 11, 9.0),
        (2, 20, 2.0),
        (3, 30, 3.0),
    ]


def test_merge_ansi_branch_executes_on_duckdb():
    """ANSI MERGE INTO executed live where the engine supports it
    (DuckDB >= 1.4). On older DuckDB (1.0.0 in the current container,
    which predates MERGE) this skips — the string-shape assert above
    still covers the branch; this test auto-activates when the
    container's DuckDB gains MERGE. r7: `pip install --upgrade duckdb`
    fails in-container (no package index), so the skip is
    environment-final here; nothing further can be done from inside
    this sandbox."""
    import duckdb

    ver = tuple(int(x) for x in duckdb.__version__.split(".")[:2])
    if ver < (1, 4):
        pytest.skip(f"duckdb {duckdb.__version__} predates MERGE INTO (needs >= 1.4)")
    assert _exec_merge_on_duckdb("ansi") == [
        (1, 11, 9.0),
        (2, 20, 2.0),
        (3, 30, 3.0),
    ]


def test_retract_log_replay_idempotent(spark, tmp_path):
    """Replaying an epoch must not duplicate retract-log rows (at-least-once
    foreachBatch redelivery -> exactly-once trace)."""
    from flink_tutorial_spark.streaming.lateness import RetractingUpsertSink

    sink = RetractingUpsertSink(spark, str(tmp_path / "r"), ["k"])
    b0 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    sink(b0, 0)
    b1 = spark.createDataFrame([("a", 5)], "k string, v int")
    sink(b1, 1)
    n_before = sink.log().count()  # 2 inserts + (retract,insert) pair = 4
    assert n_before == 4
    sink(b1, 1)  # crash-replay of epoch 1: log already committed -> no-op
    assert sink.log().count() == n_before
    assert sink.log().where("epoch = 1").count() == 2
    assert sink.read().where("k = 'a'").first().v == 5


def test_asof_join_edges(spark):
    """Backward as-of semantics: <= inclusive, latest wins, ties break
    on the right_order tuple, no-match gives NULLs, tolerance drops
    stale matches."""
    import pyspark.sql.functions as F

    from flink_tutorial_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 205), (3, "u", 50), (4, "v", 100)],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        # two right rows at ts=100 for u: order tie-break must pick rid 12
        [(10, "u", 60), (11, "u", 100), (12, "u", 100), (13, "u", 200)],
        ["rid", "k", "ts"],
    )
    out = {
        r.lid: (r.rid_asof, r.ts_asof)
        for r in asof_join(
            left, right, on=["k"], right_order=["rid"]
        ).collect()
    }
    assert out[1] == (12, 100)      # same-instant row visible, max rid wins
    assert out[2] == (13, 200)      # latest at-or-before
    assert out[3] == (None, None)   # nothing at or before ts=50... rid10@60 is after
    assert out[4] == (None, None)   # key with no right rows

    tol = {
        r.lid: r.rid_asof
        for r in asof_join(
            left,
            right,
            on=["k"],
            right_order=["rid"],
            tolerance=F.lit(10),
        ).collect()
    }
    # lid 2 @205: latest right is 200, gap 5 <= 10 -> kept;
    # lid 1 @100: gap 0 -> kept... then shrink:
    assert tol[1] == 12 and tol[2] == 13
    tight = {
        r.lid: r.rid_asof
        for r in asof_join(
            left,
            right,
            on=["k"],
            right_order=["rid"],
            tolerance=F.lit(3),
        ).collect()
    }
    assert tight[1] == 12 and tight[2] is None


def test_clamped_ledger_matches_sequential_recursion(spark, sf_dir):
    """The drawdown identity x_i = S_i - least(min_run(S), 0) must equal
    the sequential recursion x_i = max(0, x_{i-1} + d_i) on real data —
    checked per user over the whole sf frame."""
    from flink_tutorial_spark import plans

    rows = (
        plans.REGISTRY["value_clamped_ledger"]
        .fn(spark, sf_dir)
        .collect()
    )
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for seq in by_user.values():
        bal = 0.0
        for r in seq:
            bal = max(0.0, round(bal + r.delta, 2))
            assert abs(r.balance - bal) < 1e-9, (r, bal)


def test_cm_sketch_invariants(spark, sf_dir):
    """Count-min guarantees: estimate never underestimates, and on a
    corpus smaller than the cell space most items estimate exactly."""
    from flink_tutorial_spark import plans

    rows = plans.REGISTRY["freq_cm_sketch"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.est_cnt >= r.exact_cnt for r in rows)
    exact_frac = sum(1 for r in rows if r.overestimate == 0) / len(rows)
    assert exact_frac >= 0.5, exact_frac


def test_quantile_sketch_invariants(spark, sf_dir):
    """HDR-histogram quantile sketch guarantees: every estimate lands
    within the structural 1/64 relative-error bound of the exact
    interpolated percentile, and the sharded two-stage build merges to
    the bit-identical answer (count additivity)."""
    from flink_tutorial_spark import plans

    import math

    rows = plans.REGISTRY["value_quantile_sketch"].fn(spark, sf_dir).collect()
    assert rows
    # the structural 1/64 bound is vs the DISCRETE order statistic the
    # sketch targets (rank ceil(q*n)) — the interpolated p*_exact
    # columns additionally carry a sampling gap at small n
    vals = {}
    for v in (
        plans.REGISTRY["value_quantile_sketch"]
        .fn.__globals__["load_table"](spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(v.event_type, []).append(v.value)
    for r in rows:
        sv = sorted(vals[r.event_type])
        assert r.n == len(sv)
        for q, qv in (("p50", 0.5), ("p95", 0.95), ("p99", 0.99)):
            est = getattr(r, f"{q}_est")
            true = sv[math.ceil(qv * r.n) - 1]
            # bucket midpoint: |est - true| <= bucket_width/2 <= true/32
            assert abs(est - true) <= true / 32 + 0.02, (r.event_type, q, est, true)
    single = {
        (r.event_type): (r.n, r.p50_est, r.p95_est, r.p99_est) for r in rows
    }
    sharded = {
        r.event_type: (r.n, r.p50_est, r.p95_est, r.p99_est)
        for r in plans.REGISTRY["value_quantile_sharded"].fn(spark, sf_dir).collect()
    }
    assert single == sharded


def test_quantile_sketch_bucket_rule_edges(spark):
    """Bucket index must be exact on power-of-two boundaries and tiny
    values (where a 1-ulp log2 wobble would misplace a bucket without
    the integer correction)."""
    from flink_tutorial_spark.plans.queries_patterns import qsketch_buckets

    vals = [0.01, 0.02, 0.31, 0.32, 0.33, 1.27, 1.28, 10.23, 10.24, 163.84]
    df = spark.createDataFrame(
        [("t", v) for v in vals], ["event_type", "value"]
    )
    got = {
        (r.e, r.m): r.c for r in qsketch_buckets(df).collect()
    }
    import math

    expect = {}
    for v in vals:
        vc = round(v * 100)
        e = vc.bit_length() - 1
        m = (vc * 32) // (1 << e) - 32
        assert 0 <= m < 32 and (1 << e) <= vc < (1 << (e + 1))
        expect[(e, m)] = expect.get((e, m), 0) + 1
    assert got == expect


def test_quantile_sketch_zero_value_clamp(spark):
    """Zero / sub-cent values must land in the first cell (vc clamped to
    1), never a NULL octave: log2(0) is an error in DuckDB and a silent
    NULL in Spark, and the sf0.1 fixture's exponential value column DOES
    contain exact 0.00 rows (6 of them) — found by review in r10."""
    from flink_tutorial_spark.plans.queries_patterns import (
        qsketch_buckets,
        qsketch_estimate,
    )

    df = spark.createDataFrame(
        [("t", 0.0), ("t", 0.002), ("t", 0.01)], ["event_type", "value"]
    )
    cells = qsketch_buckets(df).collect()
    assert all(c.e is not None and c.m is not None for c in cells)
    assert {(c.e, c.m): c.c for c in cells} == {(0, 0): 3}
    est = qsketch_estimate(qsketch_buckets(df)).collect()[0]
    assert est.n == 3
    # first-cell midpoint: (32 + 0 + 0.5) * 1 / 3200
    assert est.p50_est == round(32.5 / 3200.0, 6)


def test_quantile_rolling_merge_equals_direct(spark, sf_dir):
    """Time-dimension mergeability: the rolling query's answer for a day
    must bit-equal the single-stage sketch built directly over that
    day's trailing-7-day raw events — daily-cell vector adds lose
    nothing (the associativity the sketch was chosen for)."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.plans.queries_patterns import (
        qsketch_buckets,
        qsketch_estimate,
    )
    from flink_tutorial_spark.session import load_table

    rolled = plans.REGISTRY["value_quantile_rolling"].fn(spark, sf_dir).collect()
    assert rolled
    # pick the latest day (full window) and one head day (partial window)
    days = sorted({r.day for r in rolled})
    for target in (days[-1], days[0]):
        ev = load_table(spark, sf_dir, "events").where(
            (F.date_trunc("day", F.col("ts")) <= target)
            & (
                F.date_trunc("day", F.col("ts"))
                > F.lit(target) - F.expr("INTERVAL 7 DAYS")
            )
        )
        direct = {
            r.event_type: (r.n, r.p50_est, r.p95_est, r.p99_est)
            for r in qsketch_estimate(qsketch_buckets(ev)).collect()
        }
        got = {
            r.event_type: (r.n, r.p50_est, r.p95_est, r.p99_est)
            for r in rolled
            if r.day == target
        }
        assert got == direct, target


def test_cm_heavy_hitters_guarantee(spark, sf_dir):
    """CM never undercounts, so the candidate set must contain EVERY
    true heavy hitter (no false negatives) with est >= exact on every
    row; the planted skew (item0 % 3 absorbs half the occurrences)
    must surface exactly the three hot items as true HHs."""
    from pyspark.sql import functions as F

    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    rows = plans.REGISTRY["freq_cm_heavy_hitters"].fn(spark, sf_dir).collect()
    assert all(r.est_cnt >= r.exact_cnt for r in rows)

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("item0"),
        )
        .where(F.col("item0").isNotNull())
        .select(
            F.when(F.col("event_id") % 4 < 2, F.col("item0") % 3)
            .otherwise(F.col("item0"))
            .alias("item")
        )
    )
    n = ev.count()
    exact_hh = {
        r.item
        for r in ev.groupBy("item").count().where(F.col("count") * 64 >= n).collect()
    }
    got_true = {r.item_id for r in rows if r.is_true_hh == 1}
    got_all = {r.item_id for r in rows}
    assert exact_hh == got_true == {0, 1, 2}
    assert exact_hh <= got_all


def test_uv_stickiness_invariants(spark, sf_dir):
    """Stickiness is DAU over trailing-7-day UV: bounded (0, 1], equal
    to 1 on the first observed day (the window holds only that day),
    and the denominator is always >= the max single-day DAU inside
    its window."""
    from flink_tutorial_spark import plans

    rows = sorted(
        plans.REGISTRY["uv_stickiness"].fn(spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    assert rows, "no days"
    assert all(0 < r.stickiness <= 1 for r in rows)
    assert all(r.wau7 >= r.dau for r in rows)
    assert rows[0].wau7 == rows[0].dau and rows[0].stickiness == 1.0


def test_timeseries_ema_matches_recursive_fold(spark, sf_dir):
    """The unrolled power-of-two weighted sum must equal the literal
    recursion ema_i = 0.5*v_i + 0.5*ema_(i-1) folded in Python over
    the same (ts, event_id)-ordered sequence, for every key."""
    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    got = {
        r.event_type: (r.n, r.ema)
        for r in plans.REGISTRY["timeseries_ema"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vs in by_type.items():
        ema = vs[0]
        for v in vs[1:]:
            ema = 0.5 * v + 0.5 * ema
        n, got_ema = got[t]
        assert n == len(vs), t
        assert abs(got_ema - round(ema, 4)) < 1e-9, (t, got_ema, ema)


def test_uv_kmv_trailing_family(spark, sf_dir):
    """Trailing-KMV invariants + the two bit-equality proofs the
    oracle can't state alone: (a) the sharded two-merge plan is
    row-identical to the single-merge plan, (b) the exact calibration
    columns agree with uv_stickiness's exact report (same window
    semantics on the hash space), and (c) below-k days are exact by
    construction."""
    from flink_tutorial_spark import plans

    single = sorted(
        map(tuple, plans.REGISTRY["uv_kmv_trailing"].fn(spark, sf_dir).collect())
    )
    sharded = sorted(
        map(
            tuple,
            plans.REGISTRY["uv_kmv_trailing_sharded"].fn(spark, sf_dir).collect(),
        )
    )
    assert single == sharded and len(single) > 0
    stick = {
        r.day: (r.dau, r.wau7)
        for r in plans.REGISTRY["uv_stickiness"].fn(spark, sf_dir).collect()
    }
    assert len(stick) == len(single)
    for day, dau, wexact, wkmv, s_kmv in single:
        assert stick[day] == (dau, wexact), day
        assert wexact >= dau > 0, day
        if wexact < 64:
            assert wkmv == wexact, day  # below-k exactness
        else:
            assert abs(wkmv - wexact) / wexact < 0.5, day
        assert 0 < s_kmv, day


def test_uv_hll_registers_differential(spark, sf_dir):
    """The HLL register state must agree with an independent pure-
    Python HLL over the same md5 hash space: reg_checksum, sum_scaled,
    v_zero, uv_exact all recomputed from raw events row-by-row. Also:
    estimate sanity within the m=64 error band (loose bound)."""
    import hashlib

    from flink_tutorial_spark import plans
    from flink_tutorial_spark.session import load_table

    rows = plans.REGISTRY["uv_hll_registers"].fn(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .collect()
    )
    days = {}
    for r in ev:
        days.setdefault(r.day, set()).add(r.user_id)
    assert len(rows) == len(days)
    for got in rows:
        users = days[got.day]
        regs = [0] * 64
        for u in users:
            hv = int(hashlib.md5(f"{u}:hll".encode()).hexdigest()[:15], 16)
            w = hv // 64
            rank = 55 if w == 0 else 55 - w.bit_length()
            j = hv % 64
            regs[j] = max(regs[j], rank)
        assert got.uv_exact == len(users), got.day
        assert got.v_zero == sum(1 for m in regs if m == 0), got.day
        assert got.reg_checksum == sum(
            (j + 1) * m for j, m in enumerate(regs)
        ), got.day
        assert got.sum_scaled == sum(1 << (55 - m) for m in regs), got.day
        assert abs(got.hll_est - got.uv_exact) / got.uv_exact < 0.6, got.day


def test_uv_hll_sharded_bit_equal(spark, sf_dir):
    """Element-wise-max shard merge must reproduce the single-stage
    register report bit-for-bit (the HLL merge algebra as a test)."""
    from flink_tutorial_spark import plans

    a = sorted(
        map(tuple, plans.REGISTRY["uv_hll_registers"].fn(spark, sf_dir).collect())
    )
    b = sorted(
        map(tuple, plans.REGISTRY["uv_hll_sharded"].fn(spark, sf_dir).collect())
    )
    assert a == b and len(a) > 0


def test_uv_kmv_retention_inclusion_exclusion(spark, sf_dir):
    """Retention-from-cells invariants: the exact branch is a true
    intersection bound, and below k the inclusion-exclusion estimate
    IS the exact overlap (all three sketches are their exact sets, so
    Â + B̂ - Û = |A| + |B| - |A ∪ B| = |A ∩ B| identically)."""
    from flink_tutorial_spark import plans

    rows = (
        plans.REGISTRY["uv_kmv_retention"].fn(spark, sf_dir).collect()
    )
    assert rows
    for day, dau, dau_next, ret_exact, union_kmv, ret_kmv, rate in map(
        tuple, rows
    ):
        assert 0 <= ret_exact <= min(dau, dau_next), day
        assert ret_kmv >= 0, day
        if dau + dau_next < 64:
            assert ret_kmv == ret_exact, day
        elif ret_exact >= 8:
            # sketch accuracy sanity on the larger pairs (same band as
            # the trailing-family test)
            assert abs(ret_kmv - ret_exact) <= max(8, ret_exact), day


def test_uv_kmv_retention_curve_invariants(spark, sf_dir):
    """The cohort curve obeys the same bounds at every horizon: exact
    retention is a true intersection bound, and below k the
    inclusion-exclusion estimate IS the exact overlap — including over
    the NON-adjacent (d, d+7) cell union."""
    from flink_tutorial_spark import plans

    rows = list(
        map(
            tuple,
            plans.REGISTRY["uv_kmv_retention_curve"].fn(spark, sf_dir).collect(),
        )
    )
    assert rows
    offs = {r[1] for r in rows}
    assert offs == {1, 3, 7}, offs
    for day, off, dau, dau_off, ret_exact, union_kmv, ret_kmv, rate in rows:
        assert 0 <= ret_exact <= min(dau, dau_off), (day, off)
        assert ret_kmv >= 0, (day, off)
        if dau + dau_off < 64:
            assert ret_kmv == ret_exact, (day, off)
