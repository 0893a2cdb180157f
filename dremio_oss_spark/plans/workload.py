"""Workload management: cost-based queue routing onto Spark scheduler
pools.

Reference: dremio-oss `services/resourcescheduler/.../basic/
BasicResourceAllocator.java` — every query is costed at plan time and
routed to a queue (`QueueType.java`: SMALL/LARGE and the
REFLECTION_SMALL/REFLECTION_LARGE pair for materialization jobs) by
comparing cost to a threshold (BasicResourceAllocator.java:155-157);
each queue caps concurrency and memory.

Spark-first mapping:
- The COST is Catalyst's own estimate: `optimizedPlan().stats()
  .sizeInBytes` — the same statistics AQE and join planning use, so
  routing agrees with what the engine will actually do.
- The QUEUE is a Spark fair-scheduler pool (`spark.scheduler.pool`
  local property): on a real cluster with
  spark.scheduler.mode=FAIR, pools give weighted shares and minShare
  guarantees — the executor-side half of workload isolation that the
  reference implements with per-queue memory grants.
- CONCURRENCY admission is a per-queue bounded semaphore on the
  driver — the reference's queue depth — so a flood of LARGE queries
  queues up instead of oversubscribing the cluster.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from ..localframe import meta_df


@dataclass
class QueueDef:
    """One workload queue (QueueType.java + its BasicResourceConstants
    limits)."""

    name: str
    max_concurrency: int
    memory_limit_bytes: int
    pool: str  # spark fair-scheduler pool name
    _sem: threading.BoundedSemaphore = field(init=False, repr=False)
    active: int = 0

    def __post_init__(self) -> None:
        self._sem = threading.BoundedSemaphore(self.max_concurrency)


class WorkloadManager:
    """Cost-based admission + routing (BasicResourceAllocator)."""

    def __init__(self, spark: SparkSession,
                 queue_threshold_bytes: int = 256 * 1024 * 1024):
        self.spark = spark
        # cost above threshold -> LARGE (BasicResourceAllocator.java:157)
        self.queue_threshold_bytes = queue_threshold_bytes
        gb = 1024 ** 3
        self.queues: dict[str, QueueDef] = {
            "SMALL": QueueDef("SMALL", 10, 8 * gb, "wlm_small"),
            "LARGE": QueueDef("LARGE", 3, 64 * gb, "wlm_large"),
            "REFLECTION_SMALL": QueueDef(
                "REFLECTION_SMALL", 10, 8 * gb, "wlm_refl_small"),
            "REFLECTION_LARGE": QueueDef(
                "REFLECTION_LARGE", 3, 64 * gb, "wlm_refl_large"),
        }
        self._lock = threading.Lock()

    # -- costing ------------------------------------------------------------
    def cost(self, df: DataFrame) -> int:
        """Catalyst's plan-size estimate in bytes (the allocator's query
        cost; stats flow from file sizes through the optimized plan)."""
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j surfaces scala BigInt either as int or as an object
        return size if isinstance(size, int) else int(size.toString())

    def classify(self, df: DataFrame, reflection_job: bool = False) -> str:
        """SMALL vs LARGE by cost threshold; reflection maintenance jobs
        ride their own queue pair (BasicResourceAllocator.java:155)."""
        big = self.cost(df) > self.queue_threshold_bytes
        if reflection_job:
            return "REFLECTION_LARGE" if big else "REFLECTION_SMALL"
        return "LARGE" if big else "SMALL"

    # -- admission ----------------------------------------------------------
    @contextmanager
    def admit(self, df: DataFrame, reflection_job: bool = False,
              timeout: float | None = None):
        """Admit a query: block until its queue has a free slot, pin the
        Spark jobs run inside the context to the queue's scheduler pool,
        release the slot on exit.  Yields the queue name."""
        with self.admit_to(self.classify(df, reflection_job),
                           timeout=timeout) as qname:
            yield qname

    @contextmanager
    def admit_to(self, qname: str, timeout: float | None = None):
        """Admission into a NAMED queue, bypassing cost classification —
        the reflection-routing hook (`ALTER ... ROUTE REFLECTIONS TO
        QUEUE <q>`, SqlAlterDatasetReflectionRouting): the user pins the
        dataset's maintenance jobs to a queue regardless of cost."""
        q = self.queues[qname]
        if not q._sem.acquire(timeout=timeout):
            raise TimeoutError(
                f"queue {qname} full ({q.max_concurrency} running)")
        sc = self.spark.sparkContext
        prev = sc.getLocalProperty("spark.scheduler.pool")
        with self._lock:
            q.active += 1
        sc.setLocalProperty("spark.scheduler.pool", q.pool)
        try:
            yield qname
        finally:
            sc.setLocalProperty("spark.scheduler.pool", prev)
            with self._lock:
                q.active -= 1
            q._sem.release()

    # -- observability ------------------------------------------------------
    def sys_queues(self) -> DataFrame:
        """sys.queues: limits + live occupancy per queue."""
        rows = [(q.name, q.max_concurrency, q.active,
                 q.memory_limit_bytes, q.pool)
                for q in self.queues.values()]
        return meta_df(self.spark, 
            rows,
            "queue string, max_concurrency int, active int, "
            "memory_limit_bytes long, scheduler_pool string")
