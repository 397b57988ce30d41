#!/bin/sh
# Round-11 bench record: loadlog sampler + full battery + burst probe +
# isolate-retimes of the r10 driver-flagged rows + diffs vs the r10/r8
# records. Run detached; writes tools/bench_r11_local1.json + hostnote.
set -x
cd /root/repo

# 10 s load samples for the run's duration
(
  while [ ! -f /tmp/bench_r11_done ]; do
    echo "$(date +%H:%M:%S) $(cat /proc/loadavg) free=$(free -g | awk '/Mem/{print $4}')G"
    sleep 10
  done
) > tools/bench_r11_local1_loadlog.txt 2>&1 &
SAMPLER=$!

timeout 3000 python bench.py > /tmp/bench_r11_raw.log 2>/tmp/bench_r11_err.log
tail -1 /tmp/bench_r11_raw.log > tools/bench_r11_local1.json
touch /tmp/bench_r11_done
wait $SAMPLER 2>/dev/null

# CPU-burst probe (the r9/r10 diagnostic): 1-way vs 32-way sum-of-squares
python - <<'EOF' > /tmp/bench_r11_burst.log 2>&1
import time
from concurrent.futures import ProcessPoolExecutor

def burn(_):
    s = 0
    for i in range(20_000_000):
        s += i * i
    return s

for trial in range(3):
    t0 = time.time(); burn(0); one = time.time() - t0
    t0 = time.time()
    with ProcessPoolExecutor(32) as ex:
        list(ex.map(burn, range(32)))
    many = time.time() - t0
    print(f"trial {trial}: 1-way {one:.2f} s, 32-way {many:.2f} s "
          f"-> per-core efficiency {one / many:.2f}")
EOF

# isolate-retimes (p50 of 3 after warm-up) for the r10 driver-flagged rows
timeout 600 python - <<'EOF' > /tmp/bench_r11_iso.log 2>&1
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
from datafusion_distributed_spark.engine import build_session

spark = build_session(app_name="iso-retime", master="local[32]")
qs = e.queries()
for name in ("dd_simhash", "sim_ann_lsh_buckets"):
    fn = qs[name]
    fn(spark, "/root/testdata/sf0.1").collect()  # warm-up
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, "/root/testdata/sf0.1").collect()
        walls.append(time.time() - t0)
    print(f"{name}: isolated p50 {statistics.median(walls):.3f} s ({walls})")
spark.stop()
EOF

# diffs
python tools/bench_diff.py tools/bench_r10_local2.json tools/bench_r11_local1.json > /tmp/bench_r11_diff_r10.log 2>&1
python tools/bench_diff.py tools/bench_r8_final.json tools/bench_r11_local1.json > /tmp/bench_r11_diff_r8.log 2>&1
echo DONE
