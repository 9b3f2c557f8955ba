#!/bin/bash
# Probe-verified 2<->8-CPU scaling pairs (VERDICT r1 item 8): each pair is
# probe->2cpu->probe->8cpu->probe; a pair counts as quiet-window only if all
# three single-thread CPU probes stay under PROBE_MAX seconds. Appends raw
# results to $OUT; report the MEDIAN efficiency over quiet pairs.
# Usage: bench/run_probed_pairs.sh <pairs> [out] [nHosts pph skew maxDepth fanMin fanRand]
set -uo pipefail
cd "$(dirname "$0")/.."
PAIRS=${1:-4}
OUT=${2:-/tmp/probed_pairs.txt}
NH=${3:-200}; PPH=${4:-20000}; SKEW=${5:-1}; MD=${6:-4}; FMIN=${7:-12}; FRAND=${8:-4}
MEM=${SPARK_DRIVER_MEM:-10g}
PROBE_MAX=${PROBE_MAX:-0.40}

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

probe() { # median of 3 single-thread busy-loop samples, pinned to cpu 30
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

runlevel() { # cores outfile (pinned AWAY from cpu0 — host IRQ noise)
  local CORES=$1 F=$2
  taskset -c 4-$((CORES+3)) java -Xmx"$MEM" $OPENS -Dspark.ui.enabled=false -cp "$CP" \
    graft.wbot.CrawlBench run "$CORES" "$F" "$NH" "$PPH" "$SKEW" "$MD" "$FMIN" "$FRAND" \
    2>/dev/null | grep -o 'cores=[0-9]* wall=[0-9.]* urls=[0-9]* rate=[0-9.]*' | head -1
}

for P in $(seq 1 "$PAIRS"); do
  P0=$(probe)
  R2=$(runlevel 2 "$OUT.l2")
  P1=$(probe)
  R8=$(runlevel 8 "$OUT.l8")
  P2=$(probe)
  RATE2=$(echo "$R2" | grep -o 'rate=[0-9.]*' | cut -d= -f2)
  RATE8=$(echo "$R8" | grep -o 'rate=[0-9.]*' | cut -d= -f2)
  QUIET=$(python3 -c "print('quiet' if max($P0,$P1,$P2) <= $PROBE_MAX else 'loud')")
  EFF=$(python3 -c "print(f'{($RATE8/$RATE2)/4:.3f}')" 2>/dev/null || echo "nan")
  echo "pair=$P probes=$P0,$P1,$P2 window=$QUIET rate2=$RATE2 rate8=$RATE8 eff=$EFF" | tee -a "$OUT"
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
