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

import duckdb

from .operators.registry import REGISTRY, _ensure_loaded
from .tables import TABLE_NAMES

DEFAULT_SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


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
    sf_dirs: tuple[str, ...] = DEFAULT_SF_DIRS,
    extra_oracles: dict[str, str] | None = None,
) -> dict[str, list[int]]:
    """Return {query_name: per-scale row counts} for every query that is
    empty at every scale in ``sf_dirs`` and not annotated ``expect_empty``.

    ``extra_oracles`` lets tests plant a synthetic always-empty oracle to
    prove the gate trips. Queries are probed smallest scale first and
    dropped from consideration at the first populated scale, so the gate's
    cost is one cheap count per healthy query.
    """
    _ensure_loaded()
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
                c = oracle_rowcount(con, sql)
                counts[n].append(c)
                if c == 0:
                    survivors[n] = sql  # still possibly vacuous — probe next scale
            pending = survivors
        finally:
            con.close()
    return {n: counts[n] for n in pending}
