"""Pre-truncation plan capture for the plan linter (VERDICT r13 #3).

Materialization boundaries truncate lineage: a memory-sink/foreachBatch
run hands downstream code a table whose plan is just a memory scan, and
``localCheckpoint()`` replaces everything upstream with
``Scan ExistingRDD``. The catalog plan census (tools/plan_audit.py) and
the BatchEvalPython/CartesianProduct gate (tests/test_plans.py) only see
the FINAL plan — so for queries that materialize mid-flight, the real
work's plan was invisible to both (25 silently-empty census rows in r13).

This module closes that hole with an opt-in capture registry:

- ``enable()`` arms capture (the audit tool / plan tests); ``drain()``
  returns and clears everything captured since. Disabled — the default —
  every hook is a single ``is None`` check, so production paths pay
  nothing.
- ``capture_df(df, label)`` records a batch DataFrame's FORMATTED
  physical plan at a boundary. ``checkpoint(df, label)`` is the
  drop-in ``df.localCheckpoint()`` replacement that captures first.
- ``capture_text(plan, label)`` records an already-stringified plan —
  used by the streaming runners with ``StreamingQuery.explainInternal``,
  the executed micro-batch physical plan (tree format).

No imports from the plans/streaming packages (they import US), so the
module is cycle-free by construction.
"""

from __future__ import annotations

_active: list[tuple[str, str]] | None = None


def enabled() -> bool:
    return _active is not None


def enable() -> None:
    """Arm capture (clears any previous captures)."""
    global _active
    _active = []


def drain() -> list[tuple[str, str]]:
    """Return captured (label, plan) pairs since enable(); re-arms.

    When capture is DISABLED this is a pure no-op returning [] — it must
    not arm capture (ADVICE r14: a stray drain() in a long-lived process
    would start unbounded plan-string accumulation)."""
    global _active
    if _active is None:
        return []
    out = _active
    _active = []
    return out


def disable() -> list[tuple[str, str]]:
    """Return captured pairs and disarm (hooks become no-ops again)."""
    global _active
    out = _active or []
    _active = None
    return out


def capture_text(plan: str, label: str) -> None:
    if _active is not None and plan:
        _active.append((label, plan))


def capture_df(df, label: str) -> None:
    """Record a batch DataFrame's formatted physical plan."""
    if _active is None:
        return
    try:
        spark = df.sparkSession
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:  # capture must never fail the query
        return
    _active.append((label, plan))


def capture_stream(q, label: str) -> None:
    """Record a live StreamingQuery's executed micro-batch physical plan
    (tree format — the plan the engine actually ran, fmgws/state ops
    included). Call after processAllAvailable, before stop."""
    if _active is None:
        return
    try:
        capture_text(str(q._jsq.explainInternal(False)), label)
    except Exception:
        pass


def checkpoint(df, label: str):
    """``df.localCheckpoint()`` that first records the pre-truncation
    plan — use at every lineage-cutting site so the linter sees the loop
    bodies localCheckpoint erases."""
    capture_df(df, label)
    return df.localCheckpoint()
