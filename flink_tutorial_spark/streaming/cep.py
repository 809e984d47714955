"""CEP-lite streaming operators (SURVEY.md §2.10): sequence detection
and match-or-timeout state machines over applyInPandasWithState.

These are the streaming twins of plans/queries_patterns.py; both derive
from the same reference programs and converge to the same results.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEQ_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("first_ts", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_matched", LongType()),
    ]
)
_SEQ_STATE = StructType([StructField("recent", ArrayType(LongType()))])


def detect_consecutive(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    flag_col: str,
    n: int,
    within_seconds: int,
    n_max: int | None = None,
) -> DataFrame:
    """Strict-contiguity CEP: n consecutive flagged events within T —
    LoginFailWithCep.scala:38-67 (Pattern.begin.next....within) and the
    ListState+timer variant LoginFail.scala:57-103.

    Sliding-streak semantics (Flink NFA parity): within an unbroken run
    of flagged events, EVERY event whose (n-1)-back flagged predecessor
    is within the time bound completes a match — overlapping matches all
    emit, and a bound violation slides the streak start forward instead
    of resetting it (so flags at t=0,20,40,55 with within=40, n=3 emit
    (0,40) AND (20,55); a reset-at-current would lose the second). Any
    non-flagged event breaks the run (strict contiguity).

    `n_max` is Flink's times(n, n_max) range quantifier (non-greedy):
    every streak length m in [n, n_max] emits its own match rows with
    n_matched = m — the NFA's branch-per-count behavior.

    Output first_ts/last_ts are epoch MICROS. State per key: the
    trailing <=n_max-1 flagged timestamps of the current run.
    Vectorized: runs fall out of cumsum(~flag); match positions are
    one shifted subtraction per run per count — no per-row Python.

    Input must arrive time-ordered per key (watermarked upstream, same
    as Flink with out-of-orderness 0)."""
    hi = n_max if n_max is not None else n
    if hi < n:
        raise ValueError("n_max must be >= n")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        carry = list(state.get[0]) if state.exists else []
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            # micros end-to-end: second-truncated bounds would disagree
            # with the relational oracle on sub-second margins
            ts = (pdf[ts_col].astype("int64") // 1_000).to_numpy()
            flags = pdf[flag_col].to_numpy(dtype=bool)
            run_id = np.cumsum(~flags)
            flagged = np.flatnonzero(flags)
            if len(flagged) == 0:
                carry = []
                continue
            rids = run_id[flagged]
            splits = np.flatnonzero(np.diff(rids)) + 1
            runs = np.split(ts[flagged], splits)
            T = runs[-1]
            for gi, run_ts in enumerate(runs):
                carried = 0
                if gi == 0 and flags[0] and carry:
                    carried = len(carry)
                    run_ts = np.concatenate(
                        [np.asarray(carry, dtype="int64"), run_ts]
                    )
                for m in range(n, hi + 1):
                    if len(run_ts) >= m:
                        # skip windows ending inside the carry: those
                        # match positions already emitted last batch
                        j0 = max(0, carried - m + 1)
                        last = run_ts[m - 1 + j0 :]
                        first = run_ts[j0 : len(run_ts) - m + 1]
                        ok = (last - first) <= within_seconds * 1_000_000
                        out.extend(
                            (key[0], int(fb), int(lb), m)
                            for fb, lb in zip(first[ok], last[ok])
                        )
                if gi == len(runs) - 1:
                    T = run_ts
            carry = [int(x) for x in T[-(hi - 1) :]] if (flags[-1] and hi > 1) else []
        state.update((carry,))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SEQ_OUT.fields])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, SEQ_OUT, _SEQ_STATE, "append", GroupStateTimeout.NoTimeout
    )


SEQUENCE_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
    ]
)
_SEQUENCE_STATE = StructType(
    [
        StructField("firsts", ArrayType(LongType())),
        StructField("progress", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("vetoes", ArrayType(LongType())),
        StructField("var_ids", ArrayType(LongType())),
    ]
)


def detect_sequence(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_cols: list[str],
    within_seconds: int,
    veto_col: str | None = None,
    optional: list[bool] | None = None,
) -> DataFrame:
    """Generalized CEP sequence detection, relaxed contiguity (Flink's
    `followedBy` chain, LoginFailWithCep.scala/OrderTimeoutWithCEP.scala
    family): each boolean step column must match in order — other events
    may intervene — with the whole match inside `within_seconds`.

    `veto_col` is the notFollowedBy analog (OrderTimeoutWithCEP pattern
    family): a veto event strictly between a sequence's start and its
    completion kills that sequence. The check runs lazily at completion
    time against the recorded veto timestamps, so results are
    deterministic under same-timestamp ties regardless of arrival order
    (a veto AT the completion timestamp does not kill — matching the
    relational NOT EXISTS with strict bounds). Scope note vs Flink: the
    veto applies over the WHOLE open span (start, completion), which
    equals Flink's per-gap notFollowedBy for 2-step patterns and is the
    conjunction of all gaps for longer ones.

    Match mode is per-start (every step-0 event opens its own in-flight
    sequence; overlapping matches all emit) — the mode with a clean
    relational equivalent, so the LIVE streaming operator is
    oracle-checkable. Strict contiguity lives in detect_consecutive.

    `optional` marks steps as Flink's .optional() quantifier: each
    optional step splits the NFA into take/skip branches. Branches are
    enumerated as concrete chains at sequence-open time (2^k in-flight
    per start for k optional steps, k is 1-2 in practice), each chain
    following the same first-occurrence rule — so the output is exactly
    the UNION of the per-chain relational oracles. Two branches
    completing on different events are two distinct Flink matches and
    both emit; callers wanting set-of-(start,end) semantics (the
    relational UNION) apply distinct() downstream. Step 0 cannot be
    optional (a match needs an anchor).

    State per key: parallel arrays of in-flight (start_us, progress,
    chain id) plus veto timestamps inside the `within` horizon.
    In-flight count is bounded by step-0 events inside the horizon —
    the watermark-expired ones drop on every batch."""
    import itertools

    n_steps = len(step_cols)
    within_us = within_seconds * 1_000_000
    opts = optional or [False] * n_steps
    if len(opts) != n_steps or (opts and opts[0]):
        raise ValueError("optional must align with step_cols; step 0 is mandatory")
    opt_idx = [i for i, o in enumerate(opts) if o]
    # concrete chains: one per subset of skipped optional steps
    chains = [
        tuple(i for i in range(n_steps) if i not in set(skip))
        for r in range(len(opt_idx) + 1)
        for skip in itertools.combinations(opt_idx, r)
    ]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        firsts, progress, lasts, vetoes, var_ids = (
            (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                list(state.get[3] or []),
                list(state.get[4] or []),
            )
            if state.exists
            else ([], [], [], [], [])
        )
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            ts_us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            flags = [pdf[c].to_numpy() for c in step_cols]
            veto_flags = pdf[veto_col].to_numpy() if veto_col else None
            for i in range(len(pdf)):
                t = int(ts_us[i])
                keep_f, keep_p, keep_l, keep_v = [], [], [], []
                for f0, p0, l0, v0 in zip(firsts, progress, lasts, var_ids):
                    if t - f0 > within_us:
                        continue  # expired
                    chain = chains[v0]
                    # strictly-later requirement matches the relational
                    # oracle (c.ts > s.ts): a tie on ts never advances,
                    # so results are stable under tie-sort order
                    if t > l0 and flags[chain[p0]][i]:
                        p0 += 1
                        if p0 == len(chain):
                            # vetoed iff a veto fell STRICTLY inside
                            # (start, completion) — drop either way
                            if not any(f0 < v < t for v in vetoes):
                                out.append((key[0], f0, t))
                            continue
                        l0 = t
                    keep_f.append(f0)
                    keep_p.append(p0)
                    keep_l.append(l0)
                    keep_v.append(v0)
                firsts, progress, lasts, var_ids = keep_f, keep_p, keep_l, keep_v
                if veto_flags is not None and veto_flags[i]:
                    vetoes.append(t)
                if flags[0][i]:
                    for vi, chain in enumerate(chains):
                        if len(chain) == 1:
                            out.append((key[0], t, t))
                        else:
                            firsts.append(t)
                            progress.append(1)
                            lasts.append(t)
                            var_ids.append(vi)
            if ts_us.size and vetoes:
                horizon = int(ts_us[-1]) - within_us
                vetoes = [v for v in vetoes if v >= horizon]
        state.update((firsts, progress, lasts, vetoes, var_ids))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in SEQUENCE_OUT.fields])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, SEQUENCE_OUT, _SEQUENCE_STATE, "append", GroupStateTimeout.NoTimeout
    )


GATE_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
    ]
)
_GATE_STATE = StructType([StructField("open_until", LongType())])


def timer_gated_forward(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    kind_col: str,
    control_kind: str,
    data_kind: str,
    open_seconds: int,
) -> DataFrame:
    """Control-stream gating — _05_CoProcessFunctionTimers.java:26-82:
    a control event opens a per-key forwarding gate for N seconds (the
    reference registers a processing-time timer to close it); data
    events pass only while the gate is open.

    connect(CoProcessFunction) becomes one keyed stateful op over the
    union of both streams; the close-timer is simply the gate deadline
    carried in state and compared in event time."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import numpy as np

        (open_until,) = state.get if state.exists else (0,)
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(ts_col)
            ts = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
            kinds = pdf[kind_col].to_numpy()
            # gate deadline in effect at each row = running max of every
            # prior control's (ts + open) and the carried-in deadline —
            # one maximum.accumulate replaces the per-row loop
            cand = np.where(kinds == control_kind, ts + open_seconds, np.int64(-(2**62)))
            eff = np.maximum(np.maximum.accumulate(cand), np.int64(open_until))
            passing = (kinds == data_kind) & (ts < eff)
            if passing.any():
                vals = pdf["value"].to_numpy(dtype="float64")[passing]
                out.extend(
                    (key[0], int(t), float(v)) for t, v in zip(ts[passing], vals)
                )
            open_until = int(eff[-1])
        state.update((open_until,))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in GATE_OUT.fields])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, GATE_OUT, _GATE_STATE, "append", GroupStateTimeout.NoTimeout
    )


TIMEOUT_OUT = StructType(
    [
        StructField("key", LongType()),
        StructField("start_ts", LongType()),
        StructField("end_ts", LongType()),
        StructField("status", StringType()),
        StructField("value", DoubleType()),
    ]
)
_TIMEOUT_STATE = StructType(
    [StructField("start_ts", LongType()), StructField("start_value", DoubleType())]
)


def match_or_timeout(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    kind_col: str,
    start_kind: str,
    end_kind: str,
    within_seconds: int,
) -> DataFrame:
    """Match-or-timeout — OrderTimeoutWithCEP.scala:38-71 / OrderTimeout.
    scala:50-127: a start event must be followed by an end event within
    T, else emit a timeout row.

    EventTimeTimeout + setTimeoutTimestamp IS Flink's
    registerEventTimeTimer: the timeout branch fires when the watermark
    passes start_ts + T, exactly like onTimer. Requires withWatermark
    on the input stream."""

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        out = []
        if state.hasTimedOut:
            start_ts, start_value = state.get
            out.append((key[0], start_ts, start_ts + within_seconds, "timeout", start_value))
            state.remove()
        else:
            start_ts, start_value = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                pdf = pdf.sort_values(ts_col)
                # column arrays once per batch (the state machine is
                # inherently sequential per key, but plain-int loops over
                # numpy arrays cut ~100x pandas row overhead)
                ts_arr = (pdf[ts_col].astype("int64") // 1_000_000_000).to_numpy()
                kind_arr = pdf[kind_col].to_numpy()
                val_arr = pdf["value"].to_numpy(dtype="float64")
                for i in range(len(ts_arr)):
                    ts = int(ts_arr[i])
                    kind = kind_arr[i]
                    if kind == start_kind:
                        start_ts, start_value = ts, float(val_arr[i])
                    elif kind == end_kind and start_ts > 0:
                        if ts - start_ts <= within_seconds:
                            out.append((key[0], start_ts, ts, "matched", start_value))
                        start_ts, start_value = 0, 0.0
            if start_ts > 0:
                state.update((start_ts, start_value))
                state.setTimeoutTimestamp((start_ts + within_seconds) * 1000)
            else:
                state.remove() if state.exists else None
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in TIMEOUT_OUT.fields])

    return df.groupBy(key_col).applyInPandasWithState(
        fn, TIMEOUT_OUT, _TIMEOUT_STATE, "append", GroupStateTimeout.EventTimeTimeout
    )
