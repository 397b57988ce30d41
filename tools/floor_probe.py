"""Round-12 continuation: decompose the per-query fixed floor (guide §1).

For each named query (or prefix), split one bench-methodology run into:
  build    - qd.fn(spark, SF_DIR): Python-side frame construction (py4j)
  plan     - force analysis + optimization + physical planning
             (queryExecution().executedPlan())
  exec     - df.collect() after the plan is forced

The bench times build+plan+exec together per run; this probe shows where the
sub-second entries' time actually goes so the optimization targets the right
layer (planning cost is per-run driver work at ANY scale; exec is the data
path).

Usage: python tools/floor_probe.py <prefix-or-name> [...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    prefixes = sys.argv[1:]
    from datafusion_distributed_spark.engine import build_session
    from datafusion_distributed_spark.operators.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = sorted(n for n in REGISTRY if any(n.startswith(p) for p in prefixes))
    if not names:
        print(f"no queries match {prefixes}")
        return 2
    spark = build_session(app_name="floor-probe")
    out: dict[str, dict[str, float]] = {}
    for name in names:
        qd = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"floor:{name}")
        try:
            qd.fn(spark, SF_DIR).collect()  # warm-up (codegen/JIT, table cache)
            builds, plans, execs = [], [], []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                df = qd.fn(spark, SF_DIR)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                df.collect()
                t3 = time.perf_counter()
                builds.append(t1 - t0)
                plans.append(t2 - t1)
                execs.append(t3 - t2)
            out[name] = {
                "build": round(statistics.median(builds), 4),
                "plan": round(statistics.median(plans), 4),
                "exec": round(statistics.median(execs), 4),
            }
            r = out[name]
            print(
                f"{name:45s} build {r['build']:.3f}  plan {r['plan']:.3f}"
                f"  exec {r['exec']:.3f}  total {r['build']+r['plan']+r['exec']:.3f}",
                flush=True,
            )
        except Exception as exc:
            print(f"{name}: FAILED {exc}", flush=True)
        spark.catalog.clearCache()
    tot = {
        k: round(sum(v[k] for v in out.values()), 2)
        for k in ("build", "plan", "exec")
    }
    print("TOTALS", json.dumps(tot))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
