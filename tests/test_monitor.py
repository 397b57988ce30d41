"""Live monitor (reference console analogue, console/README.md): polling
the scheduler beside a running query must observe in-flight stages with
task progress, and the renderer must produce the dashboard panels."""

from __future__ import annotations

import threading
import time

import pyspark.sql.functions as F

from datafusion_distributed_spark.plans.monitor import render, snapshot, watch
from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


def _slow_query(spark):
    """A query whose tasks sleep long enough for a 25 ms poller to see them."""
    import pandas as pd  # noqa: F401

    def slow(batches):
        for b in batches:
            time.sleep(0.15)
            yield b

    li = load_tables(spark, SF_DIR)["lineitem"].select("l_orderkey", "l_quantity")
    return (
        li.repartition(8)
        .mapInPandas(slow, schema="l_orderkey long, l_quantity double")
        .groupBy()
        .agg(F.sum("l_quantity").alias("q"))
    )


def test_monitor_observes_running_stages(spark):
    df = _slow_query(spark)
    snaps: list[dict] = []
    stop = threading.Event()

    def poll():
        while not stop.is_set():
            snaps.append(snapshot(spark.sparkContext))
            time.sleep(0.025)

    th = threading.Thread(target=poll, daemon=True)
    th.start()
    try:
        df.collect()
    finally:
        stop.set()
        th.join(timeout=5)

    active = [s for s in snaps if s["active_stages"]]
    assert active, "poller never saw an active stage beside the running query"
    seen = {st["stage_id"] for s in active for st in s["active_stages"]}
    assert seen  # real scheduler stage ids
    some = next(st for s in active for st in s["active_stages"])
    assert some["n_tasks"] >= 1
    assert some["n_failed"] == 0


def test_render_panels(spark):
    snap = snapshot(spark.sparkContext)  # idle
    out = render(snap)
    assert "jobs active:" in out
    assert "stages:" in out
    assert "workers:" in out
    # Fabricated busy frame exercises the progress bar deterministically.
    busy = {
        "active_jobs": [1],
        "active_stages": [
            {
                "stage_id": 3,
                "name": "count",
                "n_tasks": 8,
                "n_active": 2,
                "n_complete": 4,
                "n_failed": 0,
            }
        ],
        "executors": [
            {
                "executor_id": "driver",
                "active_tasks": 2,
                "total_cores": 8,
                "max_memory_bytes": 4 << 30,
            }
        ],
    }
    out = render(busy)
    assert "[##########..........] stage 3 count: 4/8 done, 2 running" in out
    assert "executor driver: 2 active tasks, 8 cores, 4.0 GiB storage" in out


def test_watch_drains_to_idle(spark):
    frames: list[str] = []
    snaps = watch(
        spark.sparkContext,
        interval_s=0.01,
        idle_polls=2,
        max_polls=50,
        sink=frames.append,
    )
    assert len(snaps) >= 2  # needed idle_polls consecutive idle frames
    assert len(frames) == len(snaps)
    assert all("stages:" in f for f in frames)


def test_worker_info_surface(spark):
    """GetWorkerInfo analogue (reference
    docs/source/advanced/07-worker-versioning.md): runtime/version metadata
    must be present in both the standalone call and every snapshot; the
    user-defined version string defaults to '' (a worker that never called
    with_version) and follows the conf key when set."""
    from datafusion_distributed_spark.plans.monitor import (
        WORKER_VERSION_ENV,
        snapshot,
        worker_info,
    )

    sc = spark.sparkContext
    info = worker_info(sc)
    assert info["spark_version"] == sc.version
    assert info["app_id"] == sc.applicationId
    assert info["master"].startswith("local")
    assert info["java_version"]  # jvm reachable in tests
    assert info["worker_version"] == ""  # unset -> reference default

    snap = snapshot(sc)
    assert snap["worker_info"]["spark_version"] == sc.version

    import os

    os.environ[WORKER_VERSION_ENV] = "r11-test-build"
    try:
        assert worker_info(sc)["worker_version"] == "r11-test-build"
    finally:
        del os.environ[WORKER_VERSION_ENV]
