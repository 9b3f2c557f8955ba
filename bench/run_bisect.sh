#!/bin/bash
# Attribution bisection: single N=1 (1 executor x 2 cores) legs of the deep
# job under engine-path toggles. Usage: bench/run_bisect.sh [nHosts pph maxDepth]
set -uo pipefail
cd "$(dirname "$0")/.."
NH=${1:-200}; PPH=${2:-2000}; MD=${3:-5}
OUT=${OUT:-/tmp/bisect.txt}
JAR="$PWD/target/scala-2.13/wbotspark_2.13-0.1.0.jar"
CP="$JAR:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

leg() { # label extra-env...
  local LABEL=$1; shift
  local R
  R=$(env "$@" SPARK_SCALA_VERSION=2.13 SPARK_JARS="file:$JAR" \
    SPARK_MASTER="local-cluster[1,2,8192]" SPARK_GRAFT_OFFHEAP=8g \
    taskset -c 4-7 java -Xmx6g $OPENS -Dspark.ui.enabled=false -cp "$CP" \
    graft.wbot.CrawlBench run 2 "$OUT.legs" "$NH" "$PPH" 1 "$MD" 12 4 \
    2>/dev/null | grep -o 'cores=[0-9]* wall=[0-9.]* urls=[0-9]* rate=[0-9.]*' | head -1)
  echo "leg=$LABEL $R" | tee -a "$OUT"
}

leg default
leg no_align SPARK_GRAFT_NO_SEEN_ALIGN=1
leg no_prune SPARK_GRAFT_NO_PRUNE=1
leg neither SPARK_GRAFT_NO_SEEN_ALIGN=1 SPARK_GRAFT_NO_PRUNE=1
