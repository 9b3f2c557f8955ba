#!/bin/bash
# N vs 4N CORES in one JVM — the brief's sanctioned two-parallelism form
# ("e.g. local[8] and local[32], or N and 4N cores"): local[6] (pinned to 6
# cpus) vs local[24] (pinned to 24 cpus), same input, same data-sized
# partitioning, fresh JVM per level, in-leg sampler + idle-calibrated quiet
# bar + same-state rule identical to run_cluster_pairs.sh. 6/24 rather than
# 8/32 so the sampler and probe CPUs (30/31) stay free on this 32-core host
# and the 4N level is not competing with its own measurement.
# Usage: bench/run_thread_pairs.sh <pairs> [out] [nHosts pph skew maxDepth fanMin fanRand]
set -uo pipefail
cd "$(dirname "$0")/.."
PAIRS=${1:-3}
OUT=${2:-/tmp/thread_pairs.txt}
NH=${3:-200}; PPH=${4:-20000}; SKEW=${5:-1}; MD=${6:-5}; FMIN=${7:-12}; FRAND=${8:-4}
MEM=${SPARK_DRIVER_MEM:-10g}
LO=${LO_CORES:-6}; HI=${HI_CORES:-24}
PROBE_MAX=${PROBE_MAX:-0.40}
JAR="$PWD/target/scala-2.13/wbotspark_2.13-0.1.0.jar"
CP="$JAR:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

probe() {
  taskset -c 30 python3 - <<'PY'
import time, statistics
ts=[]
for _ in range(3):
    t0=time.perf_counter()
    s=0
    for i in range(3_000_000): s+=i*i
    ts.append(time.perf_counter()-t0)
print(f"{statistics.median(ts):.3f}")
PY
}
sampler_start() {
  : > "$1"
  taskset -c 31 python3 - "$1" <<'PY' &
import sys, time
out = open(sys.argv[1], "w")
while True:
    t0 = time.perf_counter()
    s = 0
    for i in range(3_000_000): s += i*i
    out.write(f"{time.perf_counter()-t0:.3f}\n"); out.flush()
    time.sleep(5)
PY
  SAMPLER_PID=$!
}
sampler_stop() {
  kill "$SAMPLER_PID" 2>/dev/null; wait "$SAMPLER_PID" 2>/dev/null
  python3 - "$1" <<'PY'
import sys, statistics
xs = [float(l) for l in open(sys.argv[1]) if l.strip()]
if xs: print(f"{statistics.median(xs):.3f}/{max(xs):.3f}/{len(xs)}")
else: print("nan/nan/0")
PY
}

IDLE0=$(taskset -c 31 python3 - <<'PY'
import time, statistics
ts=[]
for _ in range(5):
    t0=time.perf_counter()
    s=0
    for i in range(3_000_000): s+=i*i
    ts.append(time.perf_counter()-t0)
print(f"{statistics.median(ts):.3f}")
PY
)
BAR=$(python3 -c "print('%.3f' % max($PROBE_MAX, $IDLE0 * 1.15))")
echo "idle_baseline=$IDLE0 quiet_bar=$BAR (PROBE_MAX=$PROBE_MAX) levels=local[$LO]->local[$HI]"

runlevel() { # cores outfile (pinned away from cpu0/30/31)
  local CORES=$1 F=$2
  SPARK_GRAFT_OFFHEAP=${OFFHEAP:-16g} \
  taskset -c 4-$((CORES+3)) java -Xmx"$MEM" $OPENS -Dspark.ui.enabled=false -cp "$CP" \
    graft.wbot.CrawlBench run "$CORES" "$F" "$NH" "$PPH" "$SKEW" "$MD" "$FMIN" "$FRAND" \
    2>/dev/null | grep -o 'cores=[0-9]* wall=[0-9.]* urls=[0-9]* rate=[0-9.]*' | head -1
}

for P in $(seq 1 "$PAIRS"); do
  P0=$(probe)
  sampler_start "$OUT.slo"
  RLO=$(runlevel "$LO" "$OUT.lo")
  SLO=$(sampler_stop "$OUT.slo")
  P1=$(probe)
  sampler_start "$OUT.shi"
  RHI=$(runlevel "$HI" "$OUT.hi")
  SHI=$(sampler_stop "$OUT.shi")
  P2=$(probe)
  RATELO=$(echo "$RLO" | grep -o 'rate=[0-9.]*' | cut -d= -f2)
  RATEHI=$(echo "$RHI" | grep -o 'rate=[0-9.]*' | cut -d= -f2)
  MLO=${SLO%%/*}; MHI=${SHI%%/*}
  QUIET=$(python3 -c "
try:
    m1, m4 = float('$MLO'), float('$MHI')
    ok = max(m1, m4) <= $BAR and max(m1, m4) <= 1.10 * min(m1, m4)
    print('quiet' if ok else ('state-mismatch' if max(m1, m4) <= $BAR else 'loud'))
except ValueError: print('loud')")
  RATIO=$(python3 -c "print($HI / $LO)")
  EFF=$(python3 -c "print(f'{($RATEHI/$RATELO)/$RATIO:.3f}')" 2>/dev/null || echo "nan")
  echo "pair=$P bar=$BAR probes=$P0,$P1,$P2 inleg_lo=$SLO inleg_hi=$SHI window=$QUIET rate_lo=$RATELO rate_hi=$RATEHI eff=$EFF" | tee -a "$OUT"
done
echo "--- summary ---"
python3 - "$OUT" <<'PY'
import sys, statistics
effs=[]
for line in open(sys.argv[1]):
    if 'window=quiet' in line:
        effs.append(float(line.split('eff=')[1].strip()))
print(f"quiet pairs: {len(effs)}; efficiencies: {effs}")
if effs: print(f"median efficiency: {statistics.median(effs):.3f}")
PY
