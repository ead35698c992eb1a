#!/bin/bash
# N vs 4N scaling protocol runner (BENCH.md §1).
# usage: tools/scalingbench.sh <cpuset e.g. 0-7> <cores> <nDocs> <repeats>
# Pinning the whole JVM (worker + GC + JIT threads) to exactly N cores is the
# faithful N-core-executor proxy; run each leg on an otherwise idle machine.
set -euo pipefail
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')x"
# Fixed 8g heap: A/B at matched bandwidth-probe health (BENCH.md §2b)
# measured 8g ≥ 3 GiB/core at both 8 threads (45.2k vs 42.4k docs/s) and
# 32 threads (80.7k vs 76.3k) — the earlier "8g starves the young gen"
# reading came from a co-tenant-noise window. SCALE_HEAP_GB overrides for
# re-running that A/B.
HEAP=${SCALE_HEAP_GB:-8}; [ "$HEAP" -lt 6 ] && HEAP=6
exec taskset -c "$1" java \
  --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${HEAP}g -Xms${HEAP}g \
  -cp "$CP" graft.jobs.ScalingBench "$2" "$3" "$4"
