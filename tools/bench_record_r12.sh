#!/bin/sh
# Round-12 bench record: loadlog sampler + full battery + burst probe +
# diffs vs the r11 records. Run detached; writes tools/bench_r12_local1.json
# + hostnote. The hostnote template (r11 VERDICT item 8) carries an explicit
# "deliberate cost changes" section so 0-regression claims are exact.
set -x
cd /root/repo

(
  while [ ! -f /tmp/bench_r12_done ]; do
    echo "$(date +%H:%M:%S) $(cat /proc/loadavg) free=$(free -g | awk '/Mem/{print $4}')G"
    sleep 10
  done
) > tools/bench_r12_local1_loadlog.txt 2>&1 &
SAMPLER=$!

timeout 3600 python bench.py > /tmp/bench_r12_raw.log 2>/tmp/bench_r12_err.log
tail -1 /tmp/bench_r12_raw.log > tools/bench_r12_local1.json
touch /tmp/bench_r12_done
wait $SAMPLER 2>/dev/null

# CPU-burst probe (the r9/r10 diagnostic): 1-way vs 32-way sum-of-squares
python - <<'EOF' > /tmp/bench_r12_burst.log 2>&1
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

# diffs vs the r11 records (common-subset, new entries excluded by the tool)
python tools/bench_diff.py tools/bench_r11_local2.json tools/bench_r12_local1.json > /tmp/bench_r12_diff_r11.log 2>&1
python tools/bench_diff.py tools/bench_r8_final.json tools/bench_r12_local1.json > /tmp/bench_r12_diff_r8.log 2>&1
echo DONE
