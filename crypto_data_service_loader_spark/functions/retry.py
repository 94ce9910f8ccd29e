"""Retry-with-backoff for driver-side sink calls (reference O20/O21).

The reference wraps every DB call in `manageRetryOperation` (fixed sleep, N
attempts, rethrow on exhaustion — FlowsUtil.java:25-49) and restarts the
whole upload stream up to `maxFlushDataAttempts` times
(TickersDataLoader.java:112-170). In Spark, the *read/compute* path gets
retries from the task scheduler (`spark.task.maxFailures`) and streaming
epoch re-execution; this helper covers the remaining surface: driver-side
JDBC/sink calls inside foreachBatch.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

logger = logging.getLogger(__name__)


def retry(
    op: Callable[[], T],
    attempts: int = 3,
    sleep_sec: float = 0.5,
    what: str = "operation",
    backoff: float = 1.0,
) -> T:
    """Run `op` up to `attempts` times; fixed (or geometric) sleep between;
    rethrow the last failure — same contract as the reference's wrapper."""
    delay = sleep_sec
    for attempt in range(1, attempts + 1):
        try:
            return op()
        except Exception:
            if attempt == attempts:
                logger.exception("%s failed after %d attempts", what, attempts)
                raise
            logger.warning("%s failed (attempt %d/%d), retrying in %.1fs",
                           what, attempt, attempts, delay)
            time.sleep(delay)
            delay *= backoff
    raise AssertionError("unreachable")
