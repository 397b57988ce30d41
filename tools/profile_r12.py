"""Round-12 optimization profiler (guide §1): per-query p50 timing with the
bench's collect() methodology PLUS a noop-sink timing (guide §1.4 — computation
only, no driver result transfer), and the formatted physical plan written to
plans/r12/<name>_<tag>.txt for the before/after evidence the round requires.

Usage:
    python tools/profile_r12.py before sim_pq_adc_topk dd_dup_doc_filter ...
    python tools/profile_r12.py after  sim_pq_adc_topk
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_r12.py before sim_
Names are prefixes (a bare family prefix profiles the whole family).
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
PLANS_ONLY = os.environ.get("SPARK_GRAFT_PLANS_ONLY") == "1"
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r12")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    tag = sys.argv[1]
    prefixes = sys.argv[2:]

    from datafusion_distributed_spark.engine import build_session
    from datafusion_distributed_spark.operators.registry import (
        REGISTRY,
        _ensure_loaded,
    )

    _ensure_loaded()
    names = sorted(
        n for n in REGISTRY if any(n.startswith(p) for p in prefixes)
    )
    if not names:
        print(f"no queries match {prefixes}")
        return 2
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = build_session(app_name=f"profile-r12-{tag}")
    out: dict[str, dict[str, float]] = {}
    for name in names:
        qd = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            df = qd.fn(spark, SF_DIR)
            # formatted plan -> plans/r12/<name>_<tag>.txt
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            if PLANS_ONLY:
                print(f"{name}: plan written")
                continue
            df.collect()  # warm-up
            coll, noop = [], []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                qd.fn(spark, SF_DIR).collect()
                coll.append(time.perf_counter() - t0)
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                (qd.fn(spark, SF_DIR)
                 .write.format("noop").mode("overwrite").save())
                noop.append(time.perf_counter() - t0)
            out[name] = {
                "collect_p50": round(statistics.median(coll), 4),
                "noop_p50": round(statistics.median(noop), 4),
            }
            print(f"{name}: collect {out[name]['collect_p50']}s "
                  f"noop {out[name]['noop_p50']}s")
        except Exception as exc:
            out[name] = {"error": str(exc)[:200]}  # type: ignore[dict-item]
            print(f"{name}: FAILED {exc}")
        finally:
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            import gc

            gc.collect()  # same block-release hygiene as bench.py
    path = os.path.join(PLANS_DIR, f"profile_{tag}.json")
    # merge over an existing tag file so repeated family runs accumulate
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
