#!/usr/bin/env python
"""Min-merge a series of bench.py runs into the committed
BENCH_FULL_local.json artifact (the round-7+ protocol, BASELINE.md
"Bench noise protocol"): per-query MIN over the clean runs
(noise_flag=false), raw per-run times kept in `runs`, canary ticks
concatenated, `merge` a descriptive string naming the series.

Usage:
  python tools/bench_minmerge.py "<merge note>" run1.out run2.out ... \
      [--restrict NAME=fileGlobSubstr,...]

Each input file is a bench.py stdout capture: the `FULL {...}` line is
parsed; runs whose noise_flag is true are EXCLUDED from the mins (but
still listed in the merge accounting). `--restrict` (repeatable)
limits a query's mins to runs whose filename contains one of the
given substrings — the protocol's "queries whose implementation
changed mid-series take mins only from post-change runs". Writes
BENCH_FULL_local.json at the repo root and prints the totals.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_full(path: str) -> dict | None:
    with open(path) as f:
        for line in f:
            if line.startswith("FULL "):
                return json.loads(line[5:])
    return None


def main() -> None:
    note = sys.argv[1]
    args = sys.argv[2:]
    restrict: dict[str, list[str]] = {}
    paths = []
    i = 0
    while i < len(args):
        if args[i] == "--restrict":
            name, subs = args[i + 1].split("=", 1)
            restrict[name] = subs.split(",")
            i += 2
        else:
            paths.append(args[i])
            i += 1
    fulls = []
    for p in paths:
        d = load_full(p)
        if d is None:
            print(f"WARNING: no FULL line in {p}, skipped", file=sys.stderr)
            continue
        fulls.append((p, d))
    clean = [(p, d) for p, d in fulls if not d.get("noise_flag")]
    flagged = [p for p, d in fulls if d.get("noise_flag")]
    if not clean:
        sys.exit("no clean runs")
    # union of query names (append-only catalogs: late queries appear in
    # fewer runs and take mins over the runs they appear in)
    names = sorted({n for _, d in clean for n in d["queries"]})
    # a typo'd --restrict key never matches any registered name, so the
    # intended query would silently take mins over ALL runs (including
    # pre-change ones) — the exact protocol violation this flag exists
    # to prevent; fail loudly instead
    unknown = sorted(set(restrict) - set(names))
    if unknown:
        sys.exit(
            f"--restrict names not in any clean run's catalog "
            f"(typo?): {', '.join(unknown)}"
        )
    runs: dict[str, list[float]] = {n: [] for n in names}
    for p, d in clean:
        for n in names:
            subs = restrict.get(n)
            if subs and not any(s in os.path.basename(p) for s in subs):
                continue
            runs[n].extend(d.get("runs", {}).get(n, []))
    # a restriction that matches no clean run would silently DROP the
    # query from the artifact (shrinking the catalog with no error) —
    # that is always a typo or a flagged-run accident; fail loudly
    empty = sorted(n for n, v in runs.items() if not v)
    if empty:
        sys.exit(
            f"--restrict left {len(empty)} queries with zero samples "
            f"(typo or all matching runs noise-flagged?): {', '.join(empty)}"
        )
    times = {n: min(v) for n, v in runs.items()}
    base = clean[-1][1]  # latest run: sf/staleness shape
    sys.path.insert(0, REPO)
    from bench import HEADLINE  # noqa: E402

    canary_times: list[float] = []
    for _, d in clean:
        canary_times.extend(d.get("canary", {}).get("times", []))
    # degrade like bench.py does when no ticks exist (older artifacts)
    canary_med = (
        sorted(canary_times)[len(canary_times) // 2] if canary_times else 0.0
    )
    # mirror bench.py's own `if n in times` guard: merging captures that
    # predate a headline-set change must fail with the missing names, not
    # a bare KeyError
    missing_headline = sorted(n for n in HEADLINE if n not in times)
    if missing_headline:
        sys.exit(
            "headline queries absent from every merged run: "
            + ", ".join(missing_headline)
        )
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(times[n] for n in HEADLINE), 3),
        "unit": "sec",
        "queries": times,
        "runs": runs,
        "catalog_total_sec": round(sum(times.values()), 3),
        "n_queries": len(times),
        "sf": base["sf"],
        "merge": note
        + f" ({len(clean)} clean of {len(fulls)} runs"
        + (f"; flagged: {', '.join(os.path.basename(p) for p in flagged)}" if flagged else "")
        + ")",
        "noise_flag": False,
        "canary": {
            "query": "keyed_sum",
            "times": canary_times,
            "min": min(canary_times) if canary_times else 0.0,
            "median": canary_med,
            "max_ratio": (
                round(max(canary_times) / canary_med, 2) if canary_med else 1.0
            ),
        },
        "n_headline_queries": len(HEADLINE),
        # union of per-run retry-on-outlier flags (bench.py `retried`,
        # VERDICT r16 #2 / ADVICE r17): which headliners had a
        # contaminated pair replaced by a fresh best-of-2 in a merged
        # run WHOSE SAMPLES this artifact kept — a --restrict that
        # excludes the retrying run must also drop its retry flag, or
        # the artifact would list a retry whose samples aren't in `runs`
        "retried": sorted(
            {
                n
                for p, d in clean
                for n in d.get("retried", [])
                if not restrict.get(n)
                or any(s in os.path.basename(p) for s in restrict[n])
            }
        ),
    }
    if "staleness" in base:
        out["staleness"] = base["staleness"]
    # fixture tagging (r15): recompute the subtotal from the MERGED mins
    # so the committed artifact carries it like a direct bench run does.
    # ADVICE r15: a pre-r15 base artifact carries no fixture_queries,
    # which silently dropped the subtotal even though the merged times
    # include fixture queries. The LIVE catalog tags are the truth at
    # merge time (a union across runs would resurrect a tag a later
    # round removed); fall back to the newest run carrying the field
    # only if the package import fails.
    try:
        from flink_tutorial_spark import plans  # noqa: E402

        fixture_names = sorted(
            n for n, s in plans.REGISTRY.items() if "fixture" in s.tags
        )
    except Exception:
        fixture_names = next(
            (
                sorted(d["fixture_queries"])
                for _, d in reversed(clean)
                if "fixture_queries" in d
            ),
            [],
        )
    out["fixture_queries"] = fixture_names
    out["fixture_total_sec"] = round(
        sum(times[n] for n in fixture_names if n in times), 3
    )
    out["catalog_total_excl_fixtures_sec"] = round(
        sum(t for n, t in times.items() if n not in set(fixture_names)), 3
    )
    path = os.path.join(REPO, "BENCH_FULL_local.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "headline_total_sec": out["value"],
                "catalog_total_sec": out["catalog_total_sec"],
                "n_queries": out["n_queries"],
                "clean_runs": len(clean),
                "flagged": flagged,
            }
        )
    )


if __name__ == "__main__":
    main()
