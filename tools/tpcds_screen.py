"""Round-11 TPC-DS promotion screen: run unpromoted verbatim texts through
Spark and DuckDB over a chosen view lane with the DRIVER's bit-exact canon
(repr-level floats, str-level everything else) and report per-query status.

Usage:
    python tools/tpcds_screen.py [sf_dir ...]   # default all three fixtures
    SCREEN_ONLY=q6,q65 python tools/tpcds_screen.py

Candidates and their lane/shift come from CANDIDATES below — the same
(suite, year_shift) the registration will pin. This is the gate-eligibility
evidence run (the pytest lane's 9-sig-digit compare is looser than the
driver's).
"""
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from datafusion_distributed_spark.engine import build_session
from datafusion_distributed_spark.literal import (
    register_duck_views,
    run_literal_duck,
    run_literal_sql,
)

# (qname, suite, year_shift, why-this-lane)
CANDIDATES = [
    # identical-tuple-tie class: ORDER BY covers the full output tuple, so
    # any LIMIT-cut tie is among identical rows (multiset-safe); sums are
    # integer-valued-double exact, window avgs = exact sum / count.
    ("q47", "tpcds", 0, "full-tuple ORDER (diff,1..10)"),
    ("q57", "tpcds", 0, "full-tuple ORDER (diff,1..9)"),
    ("q89", "tpcds", 0, "full-tuple ORDER (diff,store,1..8)"),
    ("q53", "tpcds", 0, "ORDER = permutation of all 3 output cols"),
    ("q63", "tpcds", 0, "ORDER = permutation of all 3 output cols"),
    # dense lane, the sf0.01-value-proven six (tests/_DENSE_PROOFS shifts)
    ("q23", "tpcds_dense", -3, "single-channel sums; ORDER = full tuple"),
    ("q24", "tpcds_dense", 0, "no LIMIT; exact sums + 0.05*avg threshold"),
    ("q54", "tpcds_dense", -1, "ORDER = full tuple; round(rev/50) dyadic-mid"),
    ("q64", "tpcds_dense", -3, "no LIMIT; exact sums"),
    ("q84", "tpcds_dense", 0, "customername functionally dep on id"),
    ("q85", "tpcds_dense", -3, "ORDER = full tuple (substr + 3 avgs)"),
    # exact-item lane
    ("q6", "tpcds_exact", 0, "whole-dollar prices -> exact category avg"),
    ("q65", "tpcds_exact", 0, "unique i_item_desc -> total (store,desc) cut"),
    ("q37", "tpcds_exact", 0, "re-screen density under exact prices"),
    # re-screens expected to CONFIRM rejection (evidence sharpening)
    ("q2", "tpcds", 0, "ROUND(ratio,2) midpoint class"),
    ("q78", "tpcds", 0, "decimal ROUND typing"),
    ("q18", "tpcds", 0, "AVG(DECIMAL) typing"),
    ("q49", "tpcds", -1, "DECIMAL/DECIMAL typing"),
    ("q61", "tpcds", 0, "DECIMAL/DECIMAL*100 typing"),
    ("q83", "tpcds", 0, "decimal deviation chain typing"),
]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def screen(spark, sf_dir: str, only=None):
    results = {}
    for qname, suite, shift, note in CANDIDATES:
        if only and qname not in only:
            continue
        t0 = time.time()
        con = duckdb.connect()
        try:
            register_duck_views(con, sf_dir, suite)
            df = run_literal_sql(spark, sf_dir, suite, qname, year_shift=shift)
            srows = df.collect()
            dcols, drows = run_literal_duck(con, suite, qname, year_shift=shift)
            n = len(df.columns)
            if n != len(dcols):
                results[qname] = f"NCOLS spark={n} duck={len(dcols)}"
                continue
            s_set = sorted(tuple(canon(r[i]) for i in range(n)) for r in srows)
            o_set = sorted(tuple(canon(r[i]) for i in range(n)) for r in drows)
            if s_set != o_set:
                diffs = [p for p in zip(s_set, o_set) if p[0] != p[1]]
                extra = ""
                if len(s_set) != len(o_set):
                    extra = f" NROWS s={len(s_set)} o={len(o_set)}"
                results[qname] = (
                    f"DIFF{extra} first={diffs[:2] if diffs else '(row-count only)'}"
                )
            elif not s_set:
                results[qname] = "EMPTY (agree)"
            else:
                results[qname] = f"OK rows={len(s_set)}"
        except Exception as exc:  # noqa: BLE001
            results[qname] = f"EXC {type(exc).__name__}: {str(exc)[:300]}"
        finally:
            con.close()
        print(f"  {qname:5s} [{suite:12s} shift={shift:+d}] "
              f"{results[qname][:240]}  ({time.time()-t0:.1f}s)  # {note}",
              flush=True)
    return results


def main():
    only = None
    if os.environ.get("SCREEN_ONLY"):
        only = set(os.environ["SCREEN_ONLY"].split(","))
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    ]
    spark = build_session(app_name="tpcds-screen", master="local[32]")
    try:
        for sf in sf_dirs:
            print(f"=== {sf} ===", flush=True)
            screen(spark, sf, only=only)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
