#!/usr/bin/env python
"""Driver-sample staleness report (VERDICT r10 #7).

With a 191-query catalog and a ~50-query/round driver sample, a query's
worst-case re-verification gap is ~4 rounds. This tool makes the
rotation honest: for every catalog name it computes the last round a
green driver row exists (CORRECTNESS_r*.json, hash_match or — for the
deliberate rows-only entries — rows_match), then reports max/median
rounds-since-last-green and the stalest names.

Used two ways:
  - CLI: `python tools/staleness_report.py` prints the one-line JSON.
  - bench.py imports `staleness_summary()` and embeds the result in
    the bench artifact so BENCH_r{N}.json carries the number.

The catalog is the plan REGISTRY (importing it needs no JVM — pyspark
module imports only), so a query registered but never driver-checked
surfaces in `never_checked` instead of silently vanishing (ADVICE r11:
deriving the catalog from driver_checked.json could only ever report
names that already had a green row). driver_checked.json remains the
fallback if the package import fails (e.g. pyspark absent).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(row: dict) -> bool:
    # deliberate rows-only entries: the driver records err='no_oracle'
    # with a spark_rows count — a successful (weaker) check, not a
    # failure.
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None and row["spark_rows"] >= 0
    if row.get("err"):
        return False
    return bool(row.get("hash_match")) or bool(row.get("rows_match"))


def last_green_rounds(repo: str = REPO) -> tuple[dict[str, int], int]:
    """{query_name: last round with a green driver row}, current round.

    Current round = max round number among CORRECTNESS files present.
    """
    last: dict[str, int] = {}
    cur = 0
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        cur = max(cur, rnd)
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and _green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last, cur


def _catalog(repo: str) -> list[str]:
    """All registered query names — the registry, not the checked set.

    The registry import only serves THIS repo: for a foreign `repo`
    argument the already-imported flink_tutorial_spark module would win
    (sys.modules cache) and silently report the wrong catalog, so a
    non-default repo goes straight to its committed name list."""
    if repo == REPO:
        try:
            import sys

            if repo not in sys.path:
                sys.path.insert(0, repo)
            from flink_tutorial_spark import plans

            return sorted(plans.REGISTRY)
        except Exception:
            pass
    cat_path = os.path.join(
        repo, "flink_tutorial_spark", "plans", "driver_checked.json"
    )
    try:
        return json.load(open(cat_path))
    except (OSError, ValueError):
        return []


def _latest_sample_size(repo: str) -> int:
    """Row count of the most recent CORRECTNESS_r*.json — the driver's
    per-round sample size (50 as of r14)."""
    best_rnd, best_n = 0, 0
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) <= best_rnd:
            continue
        try:
            data = json.load(open(path))
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            best_rnd, best_n = int(m.group(1)), len(data)
    return best_n


def staleness_summary(repo: str = REPO, n_stalest: int = 10) -> dict:
    import math

    last, cur = last_green_rounds(repo)
    catalog = _catalog(repo) or sorted(last)
    gaps = {n: (cur - last[n]) if n in last else -1 for n in catalog}
    never = sorted(n for n, g in gaps.items() if g < 0)
    seen = sorted(g for g in gaps.values() if g >= 0)
    med = seen[len(seen) // 2] if seen else 0
    stalest = sorted(
        (n for n in gaps if gaps[n] >= 0), key=lambda n: (-gaps[n], n)
    )[:n_stalest]
    # Rotation floor (VERDICT r14 #5): an N-name catalog re-verified by
    # an S-query/round sample has a rotation period of ceil(N/S) rounds,
    # so max_gap == floor is the arithmetic OPTIMUM, not staleness —
    # adjudicate max_gap against this, not an absolute number.
    sample = _latest_sample_size(repo)
    floor = math.ceil(len(catalog) / sample) if sample else 0
    return {
        "as_of_round": cur,
        "n_catalog": len(catalog),
        "sample_size": sample,
        "floor_gap_rounds": floor,
        "max_gap_rounds": max(seen) if seen else 0,
        "median_gap_rounds": med,
        "never_checked": never,
        "stalest": {n: gaps[n] for n in stalest},
    }


if __name__ == "__main__":
    print(json.dumps(staleness_summary(), sort_keys=True))
