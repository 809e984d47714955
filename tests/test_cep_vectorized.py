"""Pin the vectorized NFA advance (`_sequence_advance_batch`) against a
pure-Python event-at-a-time reference (the pre-r6 implementation), and
micro-benchmark the speedup on a single hot key (VERDICT r5 #2: the
per-event loop was the engine's one row-at-a-time path; a hot key was
single-thread Python).

No SparkSession needed — the helper is driven directly on pandas frames,
which is exactly what applyInPandasWithState hands it per key per batch.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest

from flink_tutorial_spark.streaming.cep import _sequence_advance_batch


def _reference_nfa(key0, pdf, st, chains, step_cols, ts_col, veto_col, within_us):
    """Event-at-a-time NFA: the original detect_sequence inner loop,
    kept verbatim as the correctness/timing reference."""
    firsts, progress, lasts, vetoes, var_ids = (
        (list(st[0]), list(st[1]), list(st[2]), list(st[3] or []), list(st[4] or []))
        if st is not None
        else ([], [], [], [], [])
    )
    out = []
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
            if t > l0 and flags[chain[p0]][i]:
                p0 += 1
                if p0 == len(chain):
                    if not any(f0 < v < t for v in vetoes):
                        out.append((key0, f0, t))
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
                    out.append((key0, t, t))
                else:
                    firsts.append(t)
                    progress.append(1)
                    lasts.append(t)
                    var_ids.append(vi)
    if ts_us.size and vetoes:
        horizon = int(ts_us[-1]) - within_us
        vetoes = [v for v in vetoes if v >= horizon]
    return out, (firsts, progress, lasts, vetoes, var_ids)


def _random_frame(n, seed, p_steps, p_veto=0.0, tie_every=0):
    rng = np.random.default_rng(seed)
    # seconds-spaced nanosecond timestamps with optional exact ties
    secs = np.cumsum(rng.integers(0, 3, size=n))
    if tie_every:
        a, b = secs[::tie_every], secs[1::tie_every]
        m = min(len(a), len(b))
        a[:m] = b[:m]  # numpy views: writes through to secs
    ts = pd.Series(secs * 1_000_000_000, name="ts").astype("int64")
    data = {"ts": ts}
    for i, p in enumerate(p_steps):
        data[f"s{i}"] = rng.random(n) < p
    if p_veto:
        data["veto"] = rng.random(n) < p_veto
    return pd.DataFrame(data)


CASES = [
    # (step probs, within_s, veto, optional-chains)
    (dict(p_steps=(0.1, 0.1, 0.1)), 50, None, [(0, 1, 2)]),
    (dict(p_steps=(0.2, 0.15)), 20, "veto", [(0, 1)]),
    (dict(p_steps=(0.1, 0.1, 0.1)), 40, None, [(0, 1, 2), (0, 2)]),  # step1 optional
    (dict(p_steps=(0.3, 0.3)), 5, None, [(0, 1), (0,)]),  # step1 optional, deg. chain
]


@pytest.mark.parametrize("kwargs,within,veto,chains", CASES)
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_reference(kwargs, within, veto, chains, seed):
    """Vectorized advance is byte-identical to the event-at-a-time NFA
    across random frames, multi-batch state carry, ties, and vetoes."""
    if veto:
        kwargs = dict(kwargs, p_veto=0.05)
    pdf = _random_frame(4000, seed, tie_every=7, **kwargs)
    step_cols = [f"s{i}" for i in range(len(kwargs["p_steps"]))]
    within_us = within * 1_000_000
    # split into 3 batches to exercise carried state
    cuts = [0, 1500, 2900, len(pdf)]
    st_v = st_r = None
    out_v, out_r = [], []
    for a, b in zip(cuts, cuts[1:]):
        batch = pdf.iloc[a:b].reset_index(drop=True)
        rows_v, st_v = _sequence_advance_batch(
            7, batch, st_v, chains, step_cols, "ts", veto, within_us
        )
        rows_r, st_r = _reference_nfa(
            7, batch, st_r, chains, step_cols, "ts", veto, within_us
        )
        out_v.extend(rows_v)
        out_r.extend(rows_r)
    assert sorted(out_v) == sorted(out_r)
    # carried state must agree as multisets of (first, progress, last, chain)
    zv = sorted(zip(st_v[0], st_v[1], st_v[2], st_v[4]))
    zr = sorted(zip(st_r[0], st_r[1], st_r[2], st_r[4]))
    assert zv == zr
    assert sorted(st_v[3]) == sorted(st_r[3])


# Wall-clock assertions flake under concurrent machine load (the repo's
# own r5 "regression" was exactly that — see BASELINE.md:44-72), so the
# timing checks only fire when explicitly requested; the output-
# equivalence assertions in the same tests always run.
TIMING_ASSERTS = os.environ.get("SPARK_GRAFT_TIMING_ASSERTS") == "1"


@pytest.mark.slow
def test_vectorized_speedup_hot_key():
    """>=3x faster than the event-at-a-time NFA on one hot key (VERDICT
    r5 #2 done-criterion), measured on the same frame. The equivalence
    assert is unconditional; the speedup assert is env-gated
    (SPARK_GRAFT_TIMING_ASSERTS=1) so machine load can't flake CI."""
    pdf = _random_frame(100_000, 42, p_steps=(0.05, 0.05, 0.05))
    chains = [(0, 1, 2)]
    step_cols = ["s0", "s1", "s2"]
    within_us = 60 * 1_000_000

    t0 = time.perf_counter()
    out_v, _ = _sequence_advance_batch(1, pdf, None, chains, step_cols, "ts", None, within_us)
    t_vec = time.perf_counter() - t0

    t0 = time.perf_counter()
    out_r, _ = _reference_nfa(1, pdf, None, chains, step_cols, "ts", None, within_us)
    t_ref = time.perf_counter() - t0

    assert sorted(out_v) == sorted(out_r)
    if TIMING_ASSERTS:
        assert t_ref / t_vec >= 3.0, f"speedup only {t_ref / t_vec:.1f}x ({t_ref:.2f}s vs {t_vec:.2f}s)"


@pytest.mark.slow
def test_vectorized_scales_to_1m_events_single_key():
    """A single-key 1M-event batch — the hot-key ceiling the old loop
    could not clear — completes in interactive time. Elapsed-time
    assert is env-gated (SPARK_GRAFT_TIMING_ASSERTS=1)."""
    pdf = _random_frame(1_000_000, 7, p_steps=(0.02, 0.02, 0.02))
    t0 = time.perf_counter()
    out, st = _sequence_advance_batch(
        1, pdf, None, [(0, 1, 2)], ["s0", "s1", "s2"], "ts", None, 120 * 1_000_000
    )
    elapsed = time.perf_counter() - t0
    assert len(out) > 0
    if TIMING_ASSERTS:
        assert elapsed < 5.0, f"1M-event advance took {elapsed:.1f}s"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as hs

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        seed=hs.integers(0, 2**31 - 1),
        n=hs.integers(5, 400),
        n_steps=hs.integers(1, 4),
        within=hs.integers(1, 60),
        veto=hs.booleans(),
        tie_every=hs.sampled_from([0, 2, 5]),
        cut_frac=hs.tuples(hs.floats(0.1, 0.9), hs.floats(0.1, 0.9)),
    )
    def test_vectorized_matches_reference_property(
        seed, n, n_steps, within, veto, tie_every, cut_frac
    ):
        """Property form of the equivalence pin: ANY random frame, step
        density, window, optional-step chain set, tie pattern, and batch
        split must produce identical matches and carried state."""
        rng = np.random.default_rng(seed)
        p_steps = tuple(rng.uniform(0.05, 0.4) for _ in range(n_steps))
        pdf = _random_frame(
            n, seed, p_steps=p_steps, p_veto=0.1 if veto else 0.0,
            tie_every=tie_every,
        )
        full = tuple(range(n_steps))
        chains = [full]
        if n_steps >= 3:
            chains.append((0,) + tuple(range(2, n_steps)))  # step1 optional
        step_cols = [f"s{i}" for i in range(n_steps)]
        veto_col = "veto" if veto else None
        within_us = within * 1_000_000
        cuts = sorted({0, int(n * cut_frac[0]), int(n * cut_frac[1]), n})
        st_v = st_r = None
        out_v, out_r = [], []
        for a, b in zip(cuts, cuts[1:]):
            batch = pdf.iloc[a:b].reset_index(drop=True)
            rows_v, st_v = _sequence_advance_batch(
                1, batch, st_v, chains, step_cols, "ts", veto_col, within_us
            )
            rows_r, st_r = _reference_nfa(
                1, batch, st_r, chains, step_cols, "ts", veto_col, within_us
            )
            out_v.extend(rows_v)
            out_r.extend(rows_r)
        assert sorted(out_v) == sorted(out_r)
        zv = sorted(zip(st_v[0], st_v[1], st_v[2], st_v[4]))
        zr = sorted(zip(st_r[0], st_r[1], st_r[2], st_r[4]))
        assert zv == zr
        assert sorted(st_v[3]) == sorted(st_r[3])


def _reference_match_machine(ts, kinds, vals, start_kind, end_kind, within, carried):
    """Event-at-a-time alternating start/end machine — the behavioral
    spec for _match_advance_batch (r7 deterministic semantics): before
    each start/end event, an overdue pending start (gap > within) emits
    its timeout row in place of the timer; then a start overwrites the
    pending one (no row) and an end consumes it as "matched". The fate
    of every start is thus a pure function of the next start-or-end
    event, which is what makes the converged operator output exactly
    SQL-expressible."""
    start_ts, start_val = carried
    out = []
    for t, k, v in zip(ts, kinds, vals):
        if k != start_kind and k != end_kind:
            continue
        if start_ts > 0 and t - start_ts > within:
            out.append((start_ts, start_ts + within, "timeout", start_val))
            start_ts, start_val = 0, 0.0
        if k == start_kind:
            start_ts, start_val = int(t), float(v)
        elif start_ts > 0:
            out.append((start_ts, int(t), "matched", start_val))
            start_ts, start_val = 0, 0.0
    return out, (start_ts, start_val)


def test_match_advance_matches_reference():
    """Multi-event-per-batch pairing paths (carried-start splice, ends
    without starts, consecutive ends, beyond-horizon consumption, batch
    splits) pinned against the event-at-a-time reference."""
    from flink_tutorial_spark.streaming.cep import _match_advance_batch

    rng = np.random.default_rng(7)
    for trial in range(300):
        n = int(rng.integers(1, 40))
        kinds = rng.choice(["start", "end", "other"], size=n, p=[0.4, 0.4, 0.2])
        ts = np.cumsum(rng.integers(1, 30, size=n)).astype(np.int64)
        vals = rng.random(n)
        within = int(rng.integers(5, 120))
        carried = (0, 0.0) if trial % 3 else (1, 0.5)  # pending start pre-batch
        cut = int(rng.integers(0, n + 1))
        out_v, st_v = [], carried
        out_r, st_r = [], carried
        for a, b in ((0, cut), (cut, n)):
            if a == b:
                continue
            rows, st_v = _match_advance_batch(
                ts[a:b], kinds[a:b], vals[a:b], "start", "end", within, *st_v
            )
            out_v.extend(rows)
            rows_r, st_r = _reference_match_machine(
                ts[a:b], kinds[a:b], vals[a:b], "start", "end", within, st_r
            )
            out_r.extend(rows_r)
        assert out_v == out_r, (trial, out_v, out_r)
        assert st_v == st_r, (trial, st_v, st_r)


# ---------------------------------------------------------------------------
# Differential fuzzing vs BRUTE-FORCE oracles (VERDICT r9 #7): unlike
# _reference_nfa (the old implementation kept as a twin), these oracles
# restate the SEMANTICS from scratch — per-start first-occurrence walks
# and all-window streak scans over the raw event soup — so a bug shared
# by both NFA implementations cannot hide.
# ---------------------------------------------------------------------------


def _brute_sequence(ts_us_arr, flags, chains, veto_flags, within_us):
    """Brute-force followedBy/optional/notFollowedBy/within oracle: for
    every step-0 EVENT and every concrete chain, walk the soup taking
    the first step-s time strictly after the previous advance time;
    the match stands iff it completes within the horizon and no veto
    falls strictly inside (start, end)."""
    veto_times = (
        [int(t) for t, v in zip(ts_us_arr, veto_flags) if v]
        if veto_flags is not None
        else []
    )
    out = []
    for i, t0 in enumerate(ts_us_arr):
        if not flags[0][i]:
            continue
        t0 = int(t0)
        for chain in chains:
            if len(chain) == 1:
                out.append((t0, t0))
                continue
            last, ok = t0, True
            for s in chain[1:]:
                nxt = min(
                    (int(t) for t, f in zip(ts_us_arr, flags[s]) if f and int(t) > last),
                    default=None,
                )
                if nxt is None or nxt - t0 > within_us:
                    ok = False
                    break
                last = nxt
            if ok and not any(t0 < v < last for v in veto_times):
                out.append((t0, last))
    return sorted(out)


def _brute_consecutive(ts_us_arr, flags, n, hi, within_us):
    """Brute-force times(n, n_max).consecutive().within() oracle: every
    window of m consecutive events (m in [n, hi]) that are ALL flagged
    and span <= within emits (first, last, m)."""
    out = []
    N = len(ts_us_arr)
    for m in range(n, hi + 1):
        for i in range(N - m + 1):
            if all(flags[i + j] for j in range(m)) and (
                ts_us_arr[i + m - 1] - ts_us_arr[i] <= within_us
            ):
                out.append((int(ts_us_arr[i]), int(ts_us_arr[i + m - 1]), m))
    return sorted(out)


if HAVE_HYP:

    @settings(max_examples=60, deadline=None)
    @given(
        seed=hs.integers(0, 2**31 - 1),
        n=hs.integers(5, 300),
        n_steps=hs.integers(1, 4),
        opt_mask=hs.integers(0, 7),
        within=hs.integers(1, 60),
        veto=hs.booleans(),
        tie_every=hs.sampled_from([0, 2, 5]),
        n_cuts=hs.integers(1, 3),
    )
    def test_sequence_fuzz_vs_brute_force(
        seed, n, n_steps, opt_mask, within, veto, tie_every, n_cuts
    ):
        """Randomized grid over the full followedBy quantifier surface
        — chain length x optional subsets x notFollowedBy x within x
        ties x batch splits — against the from-scratch brute-force
        oracle."""
        import itertools

        rng = np.random.default_rng(seed)
        p_steps = tuple(rng.uniform(0.05, 0.4) for _ in range(n_steps))
        pdf = _random_frame(
            n, seed, p_steps=p_steps, p_veto=0.1 if veto else 0.0,
            tie_every=tie_every,
        )
        # optional subset from the mask (step 0 mandatory)
        opt_idx = [
            i for i in range(1, n_steps) if (opt_mask >> (i - 1)) & 1
        ]
        chains = [
            tuple(i for i in range(n_steps) if i not in set(skip))
            for r in range(len(opt_idx) + 1)
            for skip in itertools.combinations(opt_idx, r)
        ]
        step_cols = [f"s{i}" for i in range(n_steps)]
        veto_col = "veto" if veto else None
        within_us = within * 1_000_000

        cuts = sorted({0, n, *rng.integers(1, max(2, n), size=n_cuts).tolist()})
        st = None
        got = []
        for a, b in zip(cuts, cuts[1:]):
            batch = pdf.iloc[a:b].reset_index(drop=True)
            rows, st = _sequence_advance_batch(
                1, batch, st, chains, step_cols, "ts", veto_col, within_us
            )
            got.extend((f, l) for _, f, l in rows)

        ts_arr = (pdf["ts"].astype("int64") // 1000).to_numpy()
        flags = [pdf[c].to_numpy() for c in step_cols]
        veto_flags = pdf["veto"].to_numpy() if veto else None
        want = _brute_sequence(ts_arr, flags, chains, veto_flags, within_us)
        # in-flight sequences not yet expired/completed at soup end are
        # the brute matches whose completion the stream hasn't seen:
        # drop brute matches still completable... they complete within
        # the soup by construction, so the outputs must match exactly
        # EXCEPT matches whose completion events lie beyond the last
        # batch — impossible here (all events fed). Exact equality.
        assert sorted(got) == want

    @settings(max_examples=60, deadline=None)
    @given(
        seed=hs.integers(0, 2**31 - 1),
        n=hs.integers(5, 300),
        nq=hs.integers(1, 4),
        extra=hs.integers(0, 3),
        within=hs.integers(1, 60),
        p_flag=hs.floats(0.2, 0.9),
        tie_every=hs.sampled_from([0, 3]),
        n_cuts=hs.integers(1, 3),
    )
    def test_consecutive_fuzz_vs_brute_force(
        seed, n, nq, extra, within, p_flag, tie_every, n_cuts
    ):
        """Randomized grid over times(a, b).consecutive().within() —
        streak thresholds x range quantifiers x dense/sparse flags x
        ties x batch splits (cross-batch carry) — against the
        all-windows brute-force oracle."""
        rng = np.random.default_rng(seed)
        pdf = _random_frame(n, seed, p_steps=(p_flag,), tie_every=tie_every)
        hi = nq + extra
        within_us = within * 1_000_000

        cuts = sorted({0, n, *rng.integers(1, max(2, n), size=n_cuts).tolist()})
        from flink_tutorial_spark.streaming.cep import _consecutive_advance_batch

        carry = []
        got = []
        for a, b in zip(cuts, cuts[1:]):
            batch = pdf.iloc[a:b].reset_index(drop=True).rename(
                columns={"ts": "ts_col"}
            )
            batch["ts_col"] = pd.to_datetime(batch["ts_col"])
            rows, carry = _consecutive_advance_batch(
                1, batch, carry, nq, hi, "ts_col", "s0", within
            )
            got.extend((f, l, m) for _, f, l, m in rows)

        ts_arr = (pdf["ts"].astype("int64") // 1000).to_numpy()
        flags = pdf["s0"].to_numpy(dtype=bool)
        want = _brute_consecutive(ts_arr, flags, nq, hi, within_us)
        assert sorted(got) == want


def test_consecutive_empty_batch_preserves_carry():
    """A zero-row micro-batch carries no evidence: the streak carry
    must pass through untouched, not reset (the helper is public and
    can be driven with an empty frame directly)."""
    from flink_tutorial_spark.streaming.cep import _consecutive_advance_batch

    empty = pd.DataFrame({"ts_col": pd.to_datetime([]), "s0": []})
    carry_in = [1_000_000, 2_000_000]
    rows, carry = _consecutive_advance_batch(
        1, empty, carry_in, 3, 3, "ts_col", "s0", 60
    )
    assert rows == [] and carry == carry_in

    # and the carried run still completes in the next non-empty batch
    batch = pd.DataFrame(
        {"ts_col": pd.to_datetime([3_000], unit="ms"), "s0": [True]}
    )
    rows, _ = _consecutive_advance_batch(
        1, batch, carry, 3, 3, "ts_col", "s0", 60
    )
    assert [(f, l, m) for _, f, l, m in rows] == [
        (1_000_000, 3_000_000, 3)
    ]
