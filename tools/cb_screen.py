"""Round-11 ClickBench promotion screen: unpromoted verbatim texts over the
clickbench_unique (Zipf/unique-key) lane — or the default lane where the
identical-tuple argument suffices — compared bit-exactly (driver canon)
across engines. Also probes the LIMIT boundary: re-runs each LIMIT-k text
with LIMIT k+3 in DUCKDB ONLY and reports whether the rank-k/k+1 sort keys
tie (a tie at the cut disqualifies unless the ORDER BY covers the full
output tuple).

Usage: python tools/cb_screen.py [sf_dir ...]
"""
import math
import re
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from datafusion_distributed_spark.engine import build_session
from datafusion_distributed_spark.literal import (
    load_literal_text,
    register_duck_views,
    run_literal_duck,
    run_literal_sql,
)

# (qname, suite, sort_key_positions or None (no cut / full-tuple), note)
CANDIDATES = [
    ("q3", "clickbench_unique", None, "AVG(UserID): bounded ids, no overflow"),
    ("q8", "clickbench_unique", [1], "regions geometric -> distinct u at cut"),
    ("q9", "clickbench_unique", [2], "regions geometric -> distinct c at cut"),
    ("q11", "clickbench_unique", [2], "models geometric -> distinct u"),
    ("q14", "clickbench_unique", [2], "engine functional on phrase bucket"),
    ("q15", "clickbench_unique", [1], "heavy users geometric -> distinct c"),
    ("q16", "clickbench_unique", [2], "(heavy user, phrase) geometric"),
    ("q23", "clickbench_unique", None, "unique EventTime -> total ORDER"),
    ("q24", "clickbench_unique", None, "unique EventTime -> total ORDER"),
    ("q25", "clickbench", None, "ORDER BY = the only output column"),
    ("q26", "clickbench_unique", None, "unique EventTime leads the ORDER"),
    ("q30", "clickbench_unique", [2], "heavy ClientIP geometric"),
    ("q31", "clickbench_unique", [2], "heavy (WatchID, ClientIP) geometric"),
    ("q32", "clickbench_unique", [2], "heavy (WatchID, ClientIP) geometric"),
    ("q33", "clickbench_unique", [1], "URL page ids geometric"),
    ("q34", "clickbench_unique", [2], "q33 + constant col"),
    ("q35", "clickbench_unique", [4], "heavy ClientIP geometric"),
    # r12 density-lane wave: engineered staircase / two-tier counts make
    # the HAVING>100000 and OFFSET windows reachable and tie-free.
    ("q17", "clickbench_dense", None, "8 (user,phrase) groups < LIMIT 10"),
    ("q19", "clickbench_dense", None, "planted official UserID literal"),
    ("q27", "clickbench_dense", [2], "two >100k counters, distinct const lens"),
    ("q28", "clickbench_dense", [2], "two >100k domains, distinct const lens"),
    ("q30", "clickbench_dense", [3], "(SE,IP) = staircase -> distinct counts"),
    ("q36", "clickbench_dense", [2], "URL staircase top-10 distinct"),
    ("q37", "clickbench_dense", [2], "Title staircase top-10 distinct"),
    ("q38", "clickbench_dense", [2], "staircase G>=1011 at sf0.1; OFFSET 1000"),
    ("q39", "clickbench_dense", [6], "q39 tuple = f(staircase g); OFFSET 1000"),
    ("q40", "clickbench_dense", [3], "two-tier 100x2+5x1 planted RefererHash"),
    ("q41", "clickbench_dense", [3], "two-tier 10000x2+5x1 planted URLHash"),
    ("q42", "clickbench_dense", [1], "ORDER BY = minute group key; OFFSET 1000"),
]

_LIMIT_RE = re.compile(r"\bLIMIT\s+(\d+)\s*;?\s*$", re.IGNORECASE)
_LIMIT_OFFSET_RE = re.compile(
    r"\bLIMIT\s+(\d+)\s+OFFSET\s+(\d+)\s*;?\s*$", re.IGNORECASE
)


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def screen(spark, sf_dir: str):
    for qname, suite, tie_cols, note in CANDIDATES:
        t0 = time.time()
        con = duckdb.connect()
        status = "?"
        try:
            register_duck_views(con, sf_dir, suite)
            df = run_literal_sql(spark, sf_dir, suite, qname)
            srows = df.collect()
            dcols, drows = run_literal_duck(con, suite, qname)
            n = len(df.columns)
            s_set = sorted(tuple(canon(r[i]) for i in range(n)) for r in srows)
            o_set = sorted(tuple(canon(r[i]) for i in range(n)) for r in drows)
            if s_set != o_set:
                diffs = [p for p in zip(s_set, o_set) if p[0] != p[1]]
                status = (f"DIFF s={len(s_set)} o={len(o_set)} "
                          f"first={diffs[:1]}")
            elif not s_set:
                status = "EMPTY (agree)"
            else:
                status = f"OK rows={len(s_set)}"
                # LIMIT/OFFSET boundary tie probes (duck only): at each
                # window edge (rank OFFSET/OFFSET+1 and, when the window is
                # full, rank OFFSET+LIMIT/OFFSET+LIMIT+1) the sort keys
                # must differ, else the window's multiset is engine-order
                # dependent.
                if tie_cols:
                    text = load_literal_text("clickbench", qname)
                    mo = _LIMIT_OFFSET_RE.search(text)
                    m = None if mo else _LIMIT_RE.search(text)
                    if mo:
                        k, off = int(mo.group(1)), int(mo.group(2))
                        boundaries = [off]
                        if len(s_set) >= k:
                            boundaries.append(off + k)
                        notes = []
                        for b in boundaries:
                            pair = con.sql(
                                _LIMIT_OFFSET_RE.sub(
                                    f"LIMIT 2 OFFSET {b - 1}", text
                                )
                            ).fetchall()
                            if len(pair) == 2:
                                tied = all(
                                    canon(pair[0][c - 1]) == canon(pair[1][c - 1])
                                    for c in tie_cols
                                )
                                notes.append(
                                    f"TIE@{b}" if tied else f"clean@{b}"
                                )
                        status += " " + (",".join(notes) or "edge-short")
                    elif m and len(s_set) >= int(m.group(1)):
                        k = int(m.group(1))
                        probe = _LIMIT_RE.sub(f"LIMIT {k + 3}", text)
                        rows = con.sql(probe).fetchall()
                        if len(rows) > k:
                            kth, nxt = rows[k - 1], rows[k]
                            tied = all(
                                canon(kth[c - 1]) == canon(nxt[c - 1])
                                for c in tie_cols
                            )
                            status += " TIE-AT-CUT" if tied else " cut-clean"
        except Exception as exc:  # noqa: BLE001
            status = f"EXC {type(exc).__name__}: {str(exc)[:240]}"
        finally:
            con.close()
        print(f"  {qname:4s} [{suite:18s}] {status[:260]} "
              f"({time.time()-t0:.1f}s)  # {note}", flush=True)


def main():
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1",
    ]
    spark = build_session(app_name="cb-screen", master="local[32]")
    try:
        for sf in sf_dirs:
            print(f"=== {sf} ===", flush=True)
            screen(spark, sf)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
