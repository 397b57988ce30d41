"""Live cluster/query monitor — the reference's console analogue.

The reference ships a terminal console that polls every worker and renders
live query/stage/worker state (/root/reference/console/README.md:1-17 — a
ratatui TUI over the workers' status endpoints). Spark's native UI already
covers most of that capability; this module is the in-process text-mode
equivalent for headless environments (CI, notebooks, driver logs): poll the
scheduler's status APIs while queries run and render a compact dashboard.

Polling sources — all read-only scheduler state, no listeners to install:
- ``StatusTracker`` for active job/stage progress (task counts per stage);
- ``AppStatusStore`` for executor inventory (the "workers" panel — in
  local mode that is the single driver-executor; on a cluster the same
  call enumerates every executor with memory/core usage).

``snapshot()`` is the machine-readable poll; ``render()`` formats one
frame; ``watch()`` loops until the attached workload goes idle. A
monitor can run in a daemon thread next to the query (see
tests/test_monitor.py) exactly like the reference console runs beside the
cluster.
"""

from __future__ import annotations

import os
import time

from pyspark import SparkContext

# Conf key / env var carrying the user-defined worker version string — the
# ``Worker::with_version()`` analogue. Free-form; deployments typically set
# it from a commit hash at submit time. Unset reports "" exactly like a
# reference worker that never called with_version().
WORKER_VERSION_CONF = "spark.datafusion_distributed_spark.worker.version"
WORKER_VERSION_ENV = "DDS_WORKER_VERSION"


def worker_info(sc: SparkContext) -> dict:
    """The reference's ``GetWorkerInfo`` endpoint mapped to Spark
    (/root/reference/docs/source/advanced/07-worker-versioning.md: workers
    report a user-defined version string plus runtime metadata so a
    coordinator can route around incompatible code during rolling
    deploys). On Spark the executors all run the ONE version the cluster
    manager shipped with the application, so worker identity collapses to
    the application runtime: framework version, the user-defined version
    string (conf key first, env var fallback, '' when unset — the
    reference's default), and the runtime identity fields its console
    prints."""
    try:
        version = sc.getConf().get(
            WORKER_VERSION_CONF, os.environ.get(WORKER_VERSION_ENV, "")
        )
    except Exception:
        version = os.environ.get(WORKER_VERSION_ENV, "")
    info = {
        "worker_version": version or "",
        "spark_version": sc.version,
        "app_id": sc.applicationId,
        "master": sc.master,
    }
    try:
        info["java_version"] = str(
            sc._jvm.java.lang.System.getProperty("java.version")
        )
    except Exception:
        info["java_version"] = ""
    return info


def snapshot(sc: SparkContext) -> dict:
    """One poll of live scheduler state.

    Returns {"active_jobs": [...], "active_stages": [{stage_id, name,
    n_tasks, n_active, n_complete, n_failed}], "executors": [{executor_id,
    active_tasks, total_cores, max_memory_bytes}]}."""
    tracker = sc.statusTracker()
    stages = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info is None:
            continue
        stages.append(
            {
                "stage_id": sid,
                "name": info.name.split(" at ")[0],
                "n_tasks": info.numTasks,
                "n_active": info.numActiveTasks,
                "n_complete": info.numCompletedTasks,
                "n_failed": info.numFailedTasks,
            }
        )
    executors = []
    try:
        it = sc._jsc.sc().statusStore().executorList(True).iterator()
        while it.hasNext():
            e = it.next()
            executors.append(
                {
                    "executor_id": e.id(),
                    "active_tasks": e.activeTasks(),
                    "total_cores": e.totalCores(),
                    "max_memory_bytes": int(e.maxMemory()),
                }
            )
    except Exception:
        pass  # store shapes vary across Spark builds; executors panel is best-effort
    return {
        "active_jobs": list(tracker.getActiveJobsIds()),
        "active_stages": stages,
        "executors": executors,
        "worker_info": worker_info(sc),
    }


def render(snap: dict) -> str:
    """One dashboard frame from a ``snapshot()`` — the reference console's
    queries/stages/workers panels as plain text."""
    lines = [f"jobs active: {len(snap['active_jobs'])}"]
    lines.append("stages:")
    if not snap["active_stages"]:
        lines.append("  (idle)")
    for s in snap["active_stages"]:
        done, total = s["n_complete"], max(s["n_tasks"], 1)
        bar_w = 20
        filled = (done * bar_w) // total
        bar = "#" * filled + "." * (bar_w - filled)
        lines.append(
            f"  [{bar}] stage {s['stage_id']} {s['name']}: "
            f"{done}/{s['n_tasks']} done, {s['n_active']} running"
            + (f", {s['n_failed']} FAILED" if s["n_failed"] else "")
        )
    lines.append("workers:")
    wi = snap.get("worker_info", {})
    if wi:
        ver = wi.get("worker_version") or "(unversioned)"
        lines.append(
            f"  runtime: spark {wi.get('spark_version', '?')}, "
            f"java {wi.get('java_version', '?')}, worker version {ver}"
        )
    for e in snap["executors"]:
        mem_gb = e["max_memory_bytes"] / (1 << 30)
        lines.append(
            f"  executor {e['executor_id']}: {e['active_tasks']} active tasks, "
            f"{e['total_cores']} cores, {mem_gb:.1f} GiB storage"
        )
    return "\n".join(lines)


def watch(
    sc: SparkContext,
    interval_s: float = 0.5,
    idle_polls: int = 4,
    max_polls: int = 10_000,
    sink=print,
) -> list[dict]:
    """Poll-and-render until the workload stays idle for ``idle_polls``
    consecutive polls (or ``max_polls``); returns the raw snapshots.

    Run it from a daemon thread beside the driver's query loop — the same
    sidecar shape as the reference console process."""
    snaps: list[dict] = []
    idle = 0
    for _ in range(max_polls):
        snap = snapshot(sc)
        snaps.append(snap)
        sink(render(snap))
        idle = idle + 1 if not snap["active_stages"] else 0
        if idle >= idle_polls:
            break
        time.sleep(interval_s)
    return snaps
