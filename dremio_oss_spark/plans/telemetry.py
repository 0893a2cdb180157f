"""Per-job query telemetry: captured plans + operator/stage metrics.

The reference persists a QueryProfile per job (`services/jobtelemetry`)
and serves it through `dac/.../resource/JobProfileResource.java:64`
(per-phase PhaseData with nested per-operator OperatorData metrics —
`services/jobs/src/main/proto/jobAnalysis.proto:75`) plus a filterable
jobs listing (`JobsListingResource.java:63-132`, item shape
`JobListingItem.java:34-62`).

Spark-first: there is no separate telemetry daemon to build — the
executed plan's SQLMetrics ARE the per-operator profile (numOutputRows,
peakMemory, spillSize, shuffle bytes — richer than the reference's
BaseMetrics), and the SparkStatusTracker keyed by the job group the
servers already set supplies the phase (stage) level.  This module
snapshots both AFTER execution into a bounded in-memory store, the same
result-set-scale contract as the REST job store.

Scale note: capture is O(plan nodes + stages) driver-side bookkeeping
per job — nothing touches executors; the store is a capped OrderedDict
so a million-query day holds the newest `cap` profiles, like the
reference's jobs KV store with its TTL.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict

from pyspark.sql import DataFrame

__all__ = ["JobTelemetryStore", "plan_operator_profile", "stage_profile"]


def _unwrap(node):
    """Descend through AQE wrapper nodes that hide the real plan:
    AdaptiveSparkPlanExec holds the final plan in `executedPlan`, and
    Spark 4 materializes stages as *QueryStageExec wrappers over
    `plan`.  Bounded walk — a wrapper chain deeper than 8 is a bug."""
    for _ in range(8):
        nn = node.nodeName()
        if nn == "AdaptiveSparkPlan":
            node = node.executedPlan()
        elif nn.endswith("QueryStage"):
            node = node.plan()
        else:
            return node
    return node


def plan_operator_profile(df: DataFrame) -> list[dict]:
    """Preorder walk of the EXECUTED plan collecting each operator's
    SQLMetric values — the reference's OperatorData rows
    (jobAnalysis.proto:59-73: operatorName + records/memory/time).
    Call only after the DataFrame executed; metrics are zero before.

    Returns [{"operatorId", "depth", "operatorName", "metrics"}...]
    with operatorId dense in preorder so successor edges are implicit
    (parent = nearest shallower predecessor), mirroring the profile
    tree the reference renders."""
    out: list[dict] = []

    def walk(node, depth: int) -> None:
        node = _unwrap(node)
        mets: dict[str, int] = {}
        try:
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                try:
                    mets[kv._1()] = int(kv._2().value())
                except Exception:  # noqa: BLE001 — uninitialized metric
                    pass
        except Exception:  # noqa: BLE001 — non-metric node
            pass
        out.append({"operatorId": len(out), "depth": depth,
                    "operatorName": node.nodeName(), "metrics": mets})
        try:
            ch = node.children()
            for i in range(ch.length()):
                walk(ch.apply(i), depth + 1)
        except Exception:  # noqa: BLE001 — leaf with no children()
            pass

    try:
        walk(df._jdf.queryExecution().executedPlan(), 0)
    except Exception:  # noqa: BLE001 — plan not executed / connect mode
        pass
    return out


def stage_profile(sc, job_group: str) -> list[dict]:
    """Per-stage task counts for every Spark job tagged with
    `job_group` — the reference's PhaseData level (a Spark stage is the
    exchange-bounded pipeline a Dremio phase/major-fragment is)."""
    phases: list[dict] = []
    try:
        st = sc.statusTracker()
        for jid in sorted(st.getJobIdsForGroup(job_group)):
            info = st.getJobInfo(jid)
            if info is None:
                continue
            for sid in sorted(info.stageIds):
                si = st.getStageInfo(sid)
                if si is None:
                    continue
                phases.append({
                    "phaseId": sid, "sparkJobId": jid,
                    "phaseName": si.name,
                    "numTasks": si.numTasks,
                    "completedTasks": si.numCompletedTasks,
                    "activeTasks": si.numActiveTasks,
                    "failedTasks": si.numFailedTasks,
                })
    except Exception:  # noqa: BLE001 — tracker gone (session stopped)
        pass
    return phases


class JobTelemetryStore:
    """Bounded per-job profile store (the reference's jobtelemetry KV
    role at in-memory scale).  Lifecycle: start -> planned -> complete;
    every mutator is lock-guarded and CANCELED is terminal, matching
    the REST job store's contract."""

    LISTING_SORT_KEYS = ("startTime", "endTime", "duration",
                        "queryUser", "state", "rowsReturned")

    def __init__(self, cap: int = 256):
        self._jobs: OrderedDict[str, dict] = OrderedDict()
        self._lock = threading.Lock()
        self._cap = cap

    # -- lifecycle ---------------------------------------------------------
    def start(self, jid: str, sql: str, user: str = "$dremio$",
              query_type: str = "REST") -> None:
        with self._lock:
            self._jobs[jid] = {
                "id": jid, "queryText": sql, "queryUser": user,
                "queryType": query_type, "state": "RUNNING",
                "startTime": int(time.time() * 1000), "endTime": None,
                "duration": None, "planningTimeMs": None,
                "executionTimeMs": None, "isAccelerated": False,
                "accelerated_by": None, "rowsReturned": None,
                "consideredReflections": [],
                "error": None, "plan": None, "operators": [],
                "phases": [], "isComplete": False, "cached_plan": False,
                "wlmQueue": None,
            }
            while len(self._jobs) > self._cap:
                # evict oldest COMPLETE first; running jobs survive the
                # soft cap, but abandoned RUNNING entries (profiled_sql
                # without finish_job) must not grow the store without
                # bound — past 4x cap the oldest goes regardless
                victim = next((k for k, v in self._jobs.items()
                               if v["isComplete"]), None)
                if victim is None:
                    if len(self._jobs) <= 4 * self._cap:
                        break
                    victim = next(iter(self._jobs))
                self._jobs.pop(victim)

    def planned(self, jid: str, planning_ms: float,
                accelerated_by: str | None = None,
                cached: bool = False,
                wlm_queue: str | None = None,
                considered: list[str] | None = None) -> None:
        with self._lock:
            job = self._jobs.get(jid)
            if job is None:
                return
            job["planningTimeMs"] = round(planning_ms, 3)
            job["accelerated_by"] = accelerated_by
            job["isAccelerated"] = bool(accelerated_by)
            # substitution candidates the probe considered (the
            # reference profile's acceleration section)
            job["consideredReflections"] = list(considered or [])
            job["cached_plan"] = cached
            if wlm_queue is not None:
                job["wlmQueue"] = wlm_queue

    def set_queue(self, jid: str, wlm_queue: str) -> None:
        with self._lock:
            job = self._jobs.get(jid)
            if job is not None:
                job["wlmQueue"] = wlm_queue

    def complete(self, jid: str, state: str = "COMPLETED",
                 df: DataFrame | None = None,
                 execution_ms: float | None = None,
                 row_count: int | None = None,
                 error: str | None = None,
                 sc=None, job_group: str | None = None) -> None:
        """Terminal transition; snapshots the executed plan's operator
        metrics and the group's stage metrics while they are hot.  The
        JVM walks happen OUTSIDE the store lock — py4j round-trips must
        not serialize other jobs' bookkeeping."""
        plan_text, operators = None, []
        if df is not None:
            try:
                plan_text = (df._jdf.queryExecution()
                             .executedPlan().toString())
            except Exception:  # noqa: BLE001
                plan_text = None
            operators = plan_operator_profile(df)
        phases = (stage_profile(sc, job_group)
                  if sc is not None and job_group else [])
        with self._lock:
            job = self._jobs.get(jid)
            if job is None:
                return
            if job["state"] == "CANCELED" and state != "CANCELED":
                return  # terminal, same rule as the REST job store
            job["state"] = state
            job["endTime"] = int(time.time() * 1000)
            job["duration"] = job["endTime"] - job["startTime"]
            if execution_ms is not None:
                job["executionTimeMs"] = round(execution_ms, 3)
            if row_count is not None:
                job["rowsReturned"] = row_count
            if error is not None:
                job["error"] = error
            if plan_text is not None:
                job["plan"] = plan_text
            if operators:
                job["operators"] = operators
            if phases:
                job["phases"] = phases
            job["isComplete"] = True

    # -- read side ---------------------------------------------------------
    def get(self, jid: str) -> dict | None:
        with self._lock:
            job = self._jobs.get(jid)
            return dict(job) if job is not None else None

    def profile(self, jid: str) -> dict | None:
        """The JobProfileResource view: summary + plan + phase/operator
        metrics in one document."""
        return self.get(jid)

    def listing(self, filter_text: str = "", state: str = "",
                user: str = "", sort: str = "startTime",
                order: str = "desc", offset: int = 0,
                limit: int = 100) -> dict:
        """JobsListingResource.java:92-132 shape: filter + sort +
        offset/limit paging over job summaries (no plan/operator
        payload — that is the profile route's job)."""
        with self._lock:
            jobs = [dict(j) for j in self._jobs.values()]
        f = filter_text.lower()
        if f:
            jobs = [j for j in jobs if f in (j["queryText"] or "").lower()]
        if state:
            jobs = [j for j in jobs if j["state"] == state.upper()]
        if user:
            jobs = [j for j in jobs if j["queryUser"] == user]
        key = sort if sort in self.LISTING_SORT_KEYS else "startTime"
        jobs.sort(key=lambda j: (j.get(key) is None, j.get(key)),
                  reverse=(order.lower() != "asc"))
        total = len(jobs)
        page = jobs[offset:offset + limit]
        summaries = [{k: j[k] for k in
                      ("id", "queryType", "queryUser", "queryText",
                       "isAccelerated", "accelerated_by", "state",
                       "startTime", "endTime", "duration",
                       "rowsReturned", "isComplete", "wlmQueue")}
                     for j in page]
        nxt = (offset + limit) if offset + limit < total else None
        return {"jobs": summaries, "total": total, "next": nxt}

    def daily_stats(self, start_ms: int = 0, end_ms: int = 0
                    ) -> list[dict]:
        """Per-UTC-day job counts by queryType + unique users — the
        aggregation behind the reference's /cluster/jobstats
        (DailyJobStatsResource.java:88) and /stats/jobsandusers
        (JobAndUserStatsResource.java:57) dashboards.  Bounds are
        epoch-ms, 0 = unbounded."""
        import datetime as _dt

        with self._lock:
            jobs = [dict(j) for j in self._jobs.values()]
        days: dict[str, dict] = {}
        for j in jobs:
            ts = j["startTime"]
            if (start_ms and ts < start_ms) or (end_ms and ts > end_ms):
                continue
            day = _dt.datetime.fromtimestamp(
                ts / 1000, _dt.timezone.utc).strftime("%Y-%m-%d")
            d = days.setdefault(day, {"date": day, "total": 0,
                                      "users": set()})
            d["total"] += 1
            d[j["queryType"]] = d.get(j["queryType"], 0) + 1
            d["users"].add(j["queryUser"])
        out = []
        for day in sorted(days):
            d = days[day]
            d["totalUniqueUsers"] = len(d.pop("users"))
            out.append(d)
        return out

    def rows_for_sys_jobs(self) -> list[tuple]:
        """Flat rows for the sys.jobs system table (one per tracked
        job) — schema kept in Engine.sys_jobs."""
        with self._lock:
            jobs = list(self._jobs.values())
        return [(j["id"], j["state"], len(j["phases"]),
                 j["queryType"], j["queryUser"], j["queryText"],
                 j["startTime"], j["endTime"],
                 j["planningTimeMs"] and float(j["planningTimeMs"]),
                 j["executionTimeMs"] and float(j["executionTimeMs"]),
                 j["accelerated_by"],
                 j["rowsReturned"]) for j in jobs]
