"""Driver-level retry + timeout for rule jobs.

Mirrors the reference's exponential-backoff retry (business_rules/
engine.py:131-151) and per-rule timeout (engine.py:214, 379-384). In
Spark, task-level retry is the cluster's job (spark.task.maxFailures);
these wrappers cover DRIVER-visible failures of a whole rule job —
transient executor loss, shuffle-fetch storms — and runaway rules.

Timeout uses a Spark job group: the rule's jobs run tagged, and on
timeout the group is cancelled server-side (not just abandoned in a
thread), so executors stop burning on the dead rule.
"""

from __future__ import annotations

import threading
import time
import uuid
from typing import Callable, TypeVar

from pyspark.sql import SparkSession

R = TypeVar("R")


def with_retry(
    fn: Callable[[], R],
    attempts: int = 3,
    base_delay: float = 0.5,
    backoff: float = 2.0,
    retryable: tuple[type[BaseException], ...] = (Exception,),
) -> R:
    """Run ``fn`` with exponential backoff; re-raises the last error."""
    last: BaseException | None = None
    delay = base_delay
    for i in range(attempts):
        try:
            return fn()
        except retryable as e:
            last = e
            if i < attempts - 1:
                time.sleep(delay)
                delay *= backoff
    assert last is not None
    raise last


def run_with_timeout(
    spark: SparkSession,
    fn: Callable[[], R],
    timeout_sec: float,
    description: str = "rule job",
) -> R:
    """Run ``fn`` (which submits Spark jobs) under a job group; cancel
    the group's jobs if the wall-clock budget is exceeded and raise
    TimeoutError."""
    group = f"sparkcheck-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext

    def _tagged() -> R:
        sc.setJobGroup(group, description, interruptOnCancel=True)
        try:
            return fn()
        finally:
            sc.setJobGroup("", "")

    # Daemon thread, NOT `with ThreadPoolExecutor`: the context manager
    # exits via shutdown(wait=True), so if fn hangs in driver-side
    # Python (fixture read, custom assertion loop) AFTER cancelJobGroup,
    # the TimeoutError would never propagate. Only Spark actions are
    # cancellable; a hung pure-Python body is abandoned on its daemon
    # thread and the timeout still fires.
    result: list[R] = []
    error: list[BaseException] = []

    def _run() -> None:
        try:
            result.append(_tagged())
        except BaseException as e:  # noqa: BLE001 — re-raised on caller thread
            error.append(e)

    t = threading.Thread(target=_run, name=f"timeout-{group}", daemon=True)
    t.start()
    t.join(timeout=timeout_sec)
    if t.is_alive():
        sc.cancelJobGroup(group)
        raise TimeoutError(
            f"{description} exceeded {timeout_sec}s; job group {group} cancelled"
        ) from None
    if error:
        raise error[0]
    return result[0]
