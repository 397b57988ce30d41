"""Registry-wide vacuity gate: no registered query may be empty everywhere.

A hash-green comparison on a 0-row result proves only that both engines
parse and plan the query — none of the operator's value semantics execute.
The reference's correctness suites value-prove every query on POPULATED
selections (/root/reference/tests/tpcds_correctness_test.rs runs at SF1
specifically so selections are non-degenerate), and round 9 demonstrated the
failure mode this gate exists to stop: two registered entries
(sim_filtered_topk, text_inverted_index) were green at every validated scale
while returning 0 rows at every validated scale — their filter thresholds
could never match the fixture data, so the distance/posting machinery they
exist to prove never ran.

The gate is oracle-side (DuckDB): every registered query carries an oracle,
the driver's correctness battery already proves Spark == oracle row-for-row,
so the oracle's row count is a faithful, cheap proxy for the Spark result's.
A query is VACUOUS iff its oracle returns 0 rows at EVERY fixture scale and
it is not annotated ``expect_empty=True`` (the opt-in for deliberate
empty-result classes — none exist today). Scales are probed cheapest-first
with early exit, so the populated majority costs one sf0.001 count each.
"""

from __future__ import annotations

import os

import duckdb

from .operators.registry import REGISTRY, _ensure_loaded
from .tables import TABLE_NAMES

DEFAULT_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def resolve_sf_dirs(
    sf_dirs: tuple[str, ...] | None = None,
) -> tuple[tuple[str, ...], tuple[str, ...]]:
    """(usable, skipped) fixture dirs for the gate. Explicit argument wins;
    else the SPARK_GRAFT_VACUITY_SF_DIRS env var (colon-separated); else
    DEFAULT_SF_DIRS. Missing dirs are SKIPPED, not fatal — a box without
    the sf0.1 fixture must not crash a validate run after every query
    already passed (ADVICE r10); callers surface ``skipped`` in their
    report so a silently narrowed gate is visible."""
    if sf_dirs is None:
        env = os.environ.get("SPARK_GRAFT_VACUITY_SF_DIRS")
        sf_dirs = tuple(p for p in env.split(":") if p) if env else DEFAULT_SF_DIRS
    usable = tuple(d for d in sf_dirs if os.path.isdir(d))
    skipped = tuple(d for d in sf_dirs if d not in usable)
    return usable, skipped


def _register_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir.rstrip('/')}/{name}.parquet')"
        )


def oracle_rowcount(
    con: duckdb.DuckDBPyConnection, oracle_sql: str
) -> int:
    """Row count of an oracle query against the currently-registered views."""
    return con.sql(f"SELECT COUNT(*) FROM ({oracle_sql})").fetchone()[0]


def vacuous_queries(
    names: list[str] | None = None,
    sf_dirs: tuple[str, ...] | None = None,
    extra_oracles: dict[str, str] | None = None,
) -> dict[str, list[int]]:
    """Return {query_name: per-scale row counts} for every query that is
    empty at every scale in ``sf_dirs`` and not annotated ``expect_empty``.

    ``sf_dirs=None`` resolves via resolve_sf_dirs (env override, missing
    fixture dirs skipped); an explicit tuple is still filtered to existing
    dirs rather than crashing mid-report. A query whose oracle ERRORS at a
    scale records -1 for that scale and stays pending (an error is not
    evidence of population); a query that errors at EVERY scale is
    reported vacuous with its -1 trail so the failure is visible rather
    than swallowed.

    ``extra_oracles`` lets tests plant a synthetic always-empty oracle to
    prove the gate trips. Queries are probed smallest scale first and
    dropped from consideration at the first populated scale, so the gate's
    cost is one cheap count per healthy query.
    """
    _ensure_loaded()
    sf_dirs, _skipped = resolve_sf_dirs(sf_dirs)
    if not sf_dirs:
        # ALL fixture dirs missing (typo'd SPARK_GRAFT_VACUITY_SF_DIRS, or a
        # box with no fixtures): with zero probes the loop below would report
        # EVERY query vacuous with an empty counts trail — inverting the
        # documented "missing dirs are skipped, not fatal" intent (ADVICE
        # r11). No evidence either way = gate skipped, not mass failure;
        # callers see the narrowed gate via resolve_sf_dirs' skipped list.
        return {}
    if names is None:
        names = sorted(REGISTRY)
    oracles: dict[str, str] = {}
    for n in names:
        qd = REGISTRY.get(n)
        if qd is None:
            continue
        if qd.expect_empty or qd.oracle is None:
            continue
        oracles[n] = qd.oracle
    if extra_oracles:
        oracles.update(extra_oracles)

    counts: dict[str, list[int]] = {n: [] for n in oracles}
    pending = dict(oracles)
    for sf_dir in sf_dirs:
        if not pending:
            break
        con = duckdb.connect()
        try:
            _register_views(con, sf_dir)
            survivors: dict[str, str] = {}
            for n, sql in pending.items():
                try:
                    c = oracle_rowcount(con, sql)
                except Exception:  # noqa: BLE001 — per-scale, not fatal
                    c = -1
                counts[n].append(c)
                if c <= 0:
                    survivors[n] = sql  # still possibly vacuous — probe next scale
            pending = survivors
        finally:
            con.close()
    return {n: counts[n] for n in pending}
