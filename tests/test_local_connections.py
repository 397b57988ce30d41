"""Small stages co-locate: the reference's local_connections contract
(/root/reference/tests/local_connections.rs): when the dynamic planner
decides all stages are small enough, it places them on one machine and
every network boundary reports ``local_connections_used > 0`` — the data
crossed the boundary without a network jump.

Spark's dynamic planner is AQE, and its co-location move is the LOCAL
shuffle read (``OptimizeShuffleWithLocalRead``): when runtime statistics
demote a statically-planned shuffle join to a broadcast join, the
already-written shuffle on the probe side is re-read with
``PartialMapperPartitionSpec`` — one consumer task per mapper, scheduled
on the mapper's host, so the fetch is machine-local. The test forces
exactly that situation (static planner sees no broadcast candidate, AQE
does), asserts the boundary reports local connections, and proves the
co-location is a pure placement decision: results are multiset-identical
to the static AQE-off plan, like the reference printing + collecting the
same query on both planners.
"""

from __future__ import annotations

import pytest

from datafusion_distributed_spark.plans.explain import local_connections_used
from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


@pytest.fixture()
def demoting_session(spark):
    """Static planner must NOT broadcast (threshold -1) while AQE MAY
    (adaptive threshold generous) — the only way the local-read rewrite
    fires. Restores both confs afterwards."""
    saved_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_adaptive = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_static)
    if saved_adaptive is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", saved_adaptive
        )


def _join_frame(spark):
    t = load_tables(spark, SF_DIR)
    return (
        t["orders"]
        .join(t["customer"], on=t["orders"].o_custkey == t["customer"].c_custkey)
        .groupBy("c_mktsegment")
        .count()
    )


def test_demoted_join_reports_local_connections(demoting_session):
    spark = demoting_session
    df = _join_frame(spark)
    rows_adaptive = {tuple(r) for r in df.collect()}

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "local" in plan, plan

    lc = local_connections_used(df)
    local_reads = [r for r in lc if r["local_connections_used"] > 0]
    assert local_reads, f"no local boundary reported: {lc}"
    # The demoted probe-side read is FULLY local — every consumer stream
    # of that boundary stayed on the producing machine, which is the
    # reference's per-boundary local_connections_used > 0 assertion made
    # exact.
    assert any(
        r["local_connections_used"] == r["total_reads"] for r in local_reads
    ), lc

    # Co-location is placement, not semantics: the static AQE-off plan
    # (remote shuffle both sides) returns the identical multiset.
    saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rows_static = {tuple(r) for r in _join_frame(spark).collect()}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved)
    assert rows_adaptive == rows_static


def test_remote_boundaries_report_zero_local(spark):
    """A plain one-shuffle aggregate has no co-locatable read: AQE's
    coalesced reduce-partition reads fetch from every mapper, so the
    counter must be 0 — the rewrite never claims locality it didn't get."""
    t = load_tables(spark, SF_DIR)
    df = t["lineitem"].groupBy("l_returnflag").count()
    df.collect()
    for r in local_connections_used(df):
        assert r["local_connections_used"] == 0, r
