"""Driver-side thread-pool helpers for overlapping independent Spark
jobs (guide §2.6).

Under PySpark's pinned-thread mode (the 3.2+ default) each Python
thread maps to its OWN JVM thread, so thread-local Spark properties —
job group, job description, scheduler pool — set in the caller are
NOT visible from a raw ``ThreadPoolExecutor`` worker thread. Jobs
submitted there escape ``setJobGroup``-based accounting (the measure
harness's job counts) and ``cancelJobGroup``-based cancellation
(ADVICE r17 #1). ``submit_inheriting`` re-establishes the caller's
properties inside the submitted callable before it runs, which is the
documented alternative to ``pyspark.InheritableThread`` for pool-based
submission."""

from __future__ import annotations

from concurrent.futures import Executor, Future
from typing import Any, Callable

_INHERITED_PROPS = (
    "spark.jobGroup.id",
    "spark.job.description",
    "spark.job.interruptOnCancel",
    "spark.scheduler.pool",
)


def submit_inheriting(
    pool: Executor, spark, fn: Callable[..., Any], *args: Any, **kw: Any
) -> Future:
    """``pool.submit(fn, *args, **kw)`` with the CALLER's job group /
    description / scheduler-pool properties re-set in the worker
    thread first, so every job the callable issues is attributed (and
    cancellable) exactly as if it ran in the calling thread."""
    sc = spark.sparkContext
    props = [(p, sc.getLocalProperty(p)) for p in _INHERITED_PROPS]

    def run() -> Any:
        for key, val in props:
            if val is not None:
                sc.setLocalProperty(key, val)
        return fn(*args, **kw)

    return pool.submit(run)
