"""Full-oracle validation of every registered query at an arbitrary scale
(default sf0.1, override with SPARK_GRAFT_SF_DIR).

Catches scale-dependent divergence (overflow, tie-breaking, sampling drift)
that the driver's sf0.01 gate can't see. Mirrors the driver comparison:
columns sorted by name, canonicalized values, multiset equality.

Usage: python tools/validate.py            # sf0.1, all queries
       python tools/validate.py tpch_q1 dd_  # only names matching a prefix
       SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/validate.py
"""
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry
from datafusion_distributed_spark.engine import build_session
from datafusion_distributed_spark.tables import TABLE_NAMES

import os
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def canon(v):
    if v is None:
        return "\x00NULL"  # sortable next to strings (rollup NULL cells)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    spark = build_session(app_name="validate", master="local[32]")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    qs = entry.queries()
    prefixes = sys.argv[1:]
    if prefixes:
        qs = {n: f for n, f in qs.items()
              if any(n.startswith(p) for p in prefixes)}
    osql = entry.oracle_sql()
    bad = []
    empty_ok = []  # green but 0 rows at THIS scale — vacuity-checked below
    for i, (name, fn) in enumerate(sorted(qs.items())):
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            rows = df.collect()
            cols = sorted(df.columns)
            sql = osql.get(name)
            if sql is None:
                print(f"[{i+1}/{len(qs)}] {name}: NO_ORACLE rows={len(rows)}")
                continue
            orc = con.sql(sql)
            ocols = sorted(orc.columns)
            if cols != ocols:
                bad.append((name, f"cols spark={cols} oracle={ocols}"))
                print(f"[{i+1}/{len(qs)}] {name}: COL MISMATCH")
                continue
            o_rows = orc.fetchall()
            o_idx = {c: j for j, c in enumerate(orc.columns)}
            s_set = sorted(tuple(canon(r[c]) for c in cols) for r in rows)
            o_set = sorted(tuple(canon(r[o_idx[c]]) for c in cols) for r in o_rows)
            if s_set != o_set:
                diffs = [(a, b) for a, b in zip(s_set, o_set) if a != b]
                bad.append(
                    (name, f"rows s={len(s_set)} o={len(o_set)} "
                           f"first_diffs={diffs[:3]}")
                )
                print(f"[{i+1}/{len(qs)}] {name}: VALUE MISMATCH "
                      f"s={len(s_set)} o={len(o_set)}")
            else:
                if not rows:
                    empty_ok.append(name)
                print(f"[{i+1}/{len(qs)}] {name}: OK rows={len(rows)} "
                      f"({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"EXC {type(e).__name__}: {e}"))
            print(f"[{i+1}/{len(qs)}] {name}: EXCEPTION {e}")
        sys.stdout.flush()
    if empty_ok:
        # Vacuity gate: a green 0-row match proves parse/plan only. Escalate
        # any query empty at THIS scale through the oracle at every fixture
        # scale; empty everywhere (and not expect_empty) is a FAILURE — the
        # r9 lesson (sim_filtered_topk / text_inverted_index were vacuously
        # green at every validated scale).
        from datafusion_distributed_spark.vacuity import (
            resolve_sf_dirs,
            vacuous_queries,
        )
        _dirs, _skipped = resolve_sf_dirs()
        if _skipped:
            print(f"\nvacuity gate: fixture dirs missing, SKIPPED: "
                  f"{list(_skipped)} (probing {list(_dirs)})")
        vac = vacuous_queries(names=empty_ok)
        for n, counts in sorted(vac.items()):
            bad.append((n, f"VACUOUS: 0 rows at every fixture scale {counts}"))
        checked = sorted(set(empty_ok) - set(vac))
        if checked:
            print(f"\nempty at this scale, populated elsewhere: {checked}")
    print(f"\n=== {len(qs) - len(bad)}/{len(qs)} OK ===")
    for n, msg in bad:
        print(f"FAIL {n}: {msg[:500]}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
