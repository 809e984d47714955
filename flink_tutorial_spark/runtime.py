"""Query lifecycle runtime: restart supervision + checkpoint recovery
(SURVEY.md §2.9 restart strategies / checkpointing).

Reference surface:
- env.enableCheckpointing(n) + FsStateBackend — KafkaToRedisWordCount.
  java:38-42 -> `checkpointLocation` on the sink; Structured Streaming
  checkpoints offsets (WAL) + state store per epoch automatically.
- fixedDelayRestart(3, 5s) / failureRateRestart / noRestart —
  RestartStrategyDemo.java:28,56-78 -> Spark retries tasks inside a
  run; whole-query restart is a driver-side supervisor loop, below.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass(frozen=True)
class RestartStrategy:
    """fixedDelayRestart(attempts, delay) analog; attempts=0 == noRestart,
    attempts=None == infinite (the checkpointing default in Flink)."""

    max_attempts: int | None = 3
    delay_seconds: float = 5.0


NO_RESTART = RestartStrategy(max_attempts=0)
FIXED_DELAY = RestartStrategy


def supervise(start_query, strategy: RestartStrategy = RestartStrategy(), on_failure=None):
    """Run a streaming query under a restart policy.

    `start_query()` must build AND start a StreamingQuery whose sink has
    a checkpointLocation — restarts then resume exactly-once from the
    offset WAL + state store, which is precisely what the reference's
    checkpointing+restart-strategy combination guarantees.

    Returns when the query finishes; raises after the policy is
    exhausted."""
    attempt = 0
    while True:
        query = start_query()
        try:
            query.awaitTermination()
            return
        except Exception as exc:  # StreamingQueryException
            attempt += 1
            if on_failure is not None:
                on_failure(exc, attempt)
            if strategy.max_attempts is not None and attempt > strategy.max_attempts:
                raise
            time.sleep(strategy.delay_seconds)
