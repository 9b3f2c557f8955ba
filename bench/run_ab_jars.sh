#!/bin/bash
# Same-window A/B attribution: alternating N=1 (1 executor x 2 cores) legs of
# the deep job under TWO jars (e.g. this round's vs last round's), full
# steps= decomposition kept per leg. The only admissible engine comparison on
# this +/-20% host (BENCH/BASELINE.md "Measurement honesty").
# Usage: bench/run_ab_jars.sh <jarA> <jarB> [rounds nHosts pph maxDepth]
set -uo pipefail
cd "$(dirname "$0")/.."
JA=$1; JB=$2
ROUNDS=${3:-2}; NH=${4:-200}; PPH=${5:-2000}; MD=${6:-5}
OUT=${OUT:-/tmp/ab_jars.txt}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

leg() { # label jar extra-env...
  local LABEL=$1 JAR=$2; shift 2
  local R
  R=$(env "$@" SPARK_SCALA_VERSION=2.13 SPARK_JARS="file:$JAR" \
    SPARK_MASTER="local-cluster[1,2,8192]" SPARK_GRAFT_OFFHEAP=8g \
    taskset -c 4-7 java -Xmx6g $OPENS -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.wbot.CrawlBench run 2 "$OUT.legs" "$NH" "$PPH" 1 "$MD" 12 4 \
    2>/dev/null | grep -o 'cores=[0-9]* wall=[0-9.]* urls=[0-9]* rate=[0-9.]* steps=[0-9:,]*' | head -1)
  echo "leg=$LABEL $R" | tee -a "$OUT"
}

for R in $(seq 1 "$ROUNDS"); do
  leg "A$R" "$JA"
  leg "B$R" "$JB"
done
