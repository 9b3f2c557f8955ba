#!/bin/bash
# Two-level crawl scaling bench.
# - one fresh JVM per run (session reuse measures slower)
# - CPU-pinned via taskset (local[N] alone doesn't bound GC/JIT threads)
# - interleaved repeats, best-of per level (the sandbox shares a noisy host)
# Usage: bench/run_crawl_bench.sh [lo hi repeats] [nHosts pph skew maxDepth fanMin fanRand]
set -euo pipefail
cd "$(dirname "$0")/.."

LO=${1:-2}; HI=${2:-8}; REPEATS=${3:-3}
NH=${4:-200}; PPH=${5:-20000}; SKEW=${6:-1}; MD=${7:-4}; FMIN=${8:-12}; FRAND=${9:-4}
OUT=$(mktemp /tmp/crawlbench.XXXX.txt)
MEM=${SPARK_DRIVER_MEM:-10g}

sbt -batch compile >/dev/null

CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

for R in $(seq 1 "$REPEATS"); do
  for CORES in "$LO" "$HI"; do
    PIN="0-$((CORES-1))"
    echo "[bench-sh] round $R level local[$CORES] pinned to cpus $PIN"
    taskset -c "$PIN" java -Xmx"$MEM" $OPENS -Dspark.ui.enabled=false -cp "$CP" \
      graft.wbot.CrawlBench run "$CORES" "$OUT" "$NH" "$PPH" "$SKEW" "$MD" "$FMIN" "$FRAND" \
      2>/dev/null | grep "crawl-bench] cores" || true
  done
done

java -Xmx1g $OPENS -cp "$CP" graft.wbot.CrawlBench report "$OUT" 2>/dev/null | grep crawl-bench
echo "[bench-sh] done; raw results in $OUT; report in BENCH/BASELINE.md"
