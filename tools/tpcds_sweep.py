"""Sweep all 99 TPC-DS literal texts differentially (Spark vs DuckDB over the
identically-derived views) and classify each: OK/EMPTY (match), MISMATCH,
SPARK_ERR, DUCK_ERR. Builder tool for deciding which texts to enable in
tests/test_literal_sql.py. Usage:
    python tools/tpcds_sweep.py [q1 q72 ...]   # default: all 99

Known engine divergence (q14, the one shift-only text): GROUP BY ROLLUP over
an EMPTY input. Minimal repro —
    SELECT k, sum(v) FROM (SELECT 'a' AS k, 1 AS v WHERE 1=0) t
    GROUP BY ROLLUP(k)
DuckDB returns one row (NULL, NULL) — the SQL-standard ()-grouping-set row,
like a global aggregate over empty input; Spark returns zero rows. Round-8
probe pinned WHERE the divergence lives: it is NOT the
PropagateEmptyRelation optimizer rule — with that rule (and PruneFilters/
ConvertToLocalRelation) excluded via spark.sql.optimizer.excludedRules AND
AQE off, the optimized plan keeps the full Expand + Aggregate and STILL
yields zero rows. Spark encodes ROLLUP as Expand + a GROUPED aggregate on
spark_grouping_id, and a grouped aggregate over zero input rows has zero
groups — including the () grand-total set — so the standard row is
unproducible by construction, not by optimization. No conf restores it.
q14's VERBATIM selection is provably empty on the driver
data (it wants 2001-11; orders end 2001-08), so that spelling cannot agree;
the lane runs q14 under the year-shift contract only (-1 lands on Nov 2000:
populated, 100 rows, engines agree).
"""
import math
import sys
import time
import traceback
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")
from datafusion_distributed_spark.engine import build_session
from datafusion_distributed_spark.literal import (
    register_duck_views,
    run_literal_duck,
    run_literal_sql,
)

SF_DIR = __import__("os").environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9e}"
    return str(v)


def main():
    spark = build_session(app_name="tpcds-sweep", master="local[16]")
    con = duckdb.connect()
    register_duck_views(con, SF_DIR, "tpcds")
    names = sys.argv[1:] or [f"q{i}" for i in range(1, 100)]
    counts = {}
    for name in names:
        t0 = time.time()
        try:
            df = run_literal_sql(spark, SF_DIR, "tpcds", name)
            rows = df.collect()
            s_set = sorted(tuple(canon(v) for v in r) for r in rows)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name}: SPARK_ERR {msg}")
            counts["SPARK_ERR"] = counts.get("SPARK_ERR", 0) + 1
            continue
        try:
            cols, drows = run_literal_duck(con, "tpcds", name)
            o_set = sorted(tuple(canon(v) for v in r) for r in drows)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{name}: DUCK_ERR {msg}")
            counts["DUCK_ERR"] = counts.get("DUCK_ERR", 0) + 1
            continue
        dt = time.time() - t0
        if s_set == o_set:
            tag = "EMPTY" if not s_set else f"OK rows={len(s_set)}"
            print(f"{name}: {tag} ({dt:.1f}s)")
            counts["EMPTY" if not s_set else "OK"] = counts.get(
                "EMPTY" if not s_set else "OK", 0) + 1
        else:
            diffs = [p for p in zip(s_set, o_set) if p[0] != p[1]][:2]
            print(
                f"{name}: MISMATCH spark={len(s_set)} duck={len(o_set)} "
                f"({dt:.1f}s) first={diffs}"
            )
            counts["MISMATCH"] = counts.get("MISMATCH", 0) + 1
    print("===", counts)


if __name__ == "__main__":
    main()
