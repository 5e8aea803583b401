#!/bin/bash
# Round-5 refresh of the supplementary true-multi-executor legs
# (BASELINE.md "Supplementary: true multi-executor legs"): same-window
# local-cluster[k,1,4096] vs local[k] crawl legs on the current code, so
# the topology delta (the quantity of interest — absolute noise cancels
# in the same-window comparison) is measured against the round-5 drain.
# Usage: tools/lc_refresh.sh [passes]   (default 2)
# Requires /tmp/cp.txt (sbt "export Runtime/fullClasspath" | tail -1).
set -u
# fail fast with a clear message instead of launching java with an
# empty -cp (ADVICE r5)
if [ ! -r /tmp/cp.txt ]; then
  echo "lc_refresh: /tmp/cp.txt missing — run: sbt 'export Runtime/fullClasspath' | tail -1 > /tmp/cp.txt" >&2
  exit 2
fi
CP=$(cat /tmp/cp.txt)
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=${LC_REFRESH_OUT:-/tmp/lc_refresh.tsv}

idlest() {
  local n=$1
  paste <(grep -E '^cpu[0-9]+' /proc/stat) <(sleep 0.4; grep -E '^cpu[0-9]+' /proc/stat) | \
  awk -v n="$n" '{
    cpu=substr($1,4)+0
    t0=$2+$3+$4+$5+$6+$7+$8+$9+$10+$11; i0=$5+$6
    t1=$13+$14+$15+$16+$17+$18+$19+$20+$21+$22; i1=$16+$17
    busy=(t1-t0-(i1-i0))/(t1-t0>0?t1-t0:1)
    printf "%f %d\n", busy, cpu
  }' | sort -n | head -n "$n" | awk '{print $2}' | sort -n | paste -sd,
}

leg() { # leg <mode:l|lc> <cores>
  local mode=$1 cores=$2 pins ncpu out
  if [ "$mode" = lc ]; then
    ncpu=$((cores + 1))   # driver gets its own core (separate-driver-node model)
  else
    ncpu=$cores
  fi
  pins=$(idlest "$ncpu")
  if [ "$mode" = lc ]; then
    out=$(SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
      SPARK_GRAFT_MASTER='local-cluster[{cores},1,4096]' \
      taskset -c "$pins" java $OPENS -Dspark.ui.enabled=false -Xmx8g \
      -XX:ActiveProcessorCount=$ncpu -cp "$CP" \
      graft.Bench --crawl "$cores" 100000 true 2>/dev/null | grep CRAWL_LEG)
  else
    out=$(taskset -c "$pins" java $OPENS -Dspark.ui.enabled=false -Xmx24g \
      -XX:ActiveProcessorCount=$cores -cp "$CP" \
      graft.Bench --crawl "$cores" 100000 true 2>/dev/null | grep CRAWL_LEG)
  fi
  if [ -z "$out" ]; then
    # a failed java launch (or a leg that died before CRAWL_LEG) must
    # not append a timestamp-only malformed row and print a
    # success-looking line (ADVICE r5)
    echo "lc_refresh: $mode$cores leg produced no CRAWL_LEG line — skipping TSV append" >&2
    return 1
  fi
  echo -e "$(date +%H:%M:%S)\t$mode$cores\t$pins\t$out" >> "$OUT"
  echo "$(date +%H:%M:%S) $mode$cores pins=$pins $out"
}

PASSES=${1:-2}
for i in $(seq 1 "$PASSES"); do
  # order interleaves topologies so both see the same noise window
  leg lc 4; sleep 5
  leg l  4; sleep 5
  leg lc 1; sleep 5
  leg l  1; sleep 5
done
