#!/bin/bash
# Quiet-host re-measure of selected headlines: fresh-session child per
# query (bench.py --one, same methodology as the sweep), one line each.
# Usage: tools/measure_some.sh q1 q2 ...   (SPARK_GRAFT_SF_DIR honored)
cd "$(dirname "$0")/.." || exit 1
for q in "$@"; do
  s=$(awk '/^cpu /{print $9; exit}' /proc/stat)
  t=$(python bench.py --one "$q" 2>/dev/null | tail -1)
  e=$(awk '/^cpu /{print $9; exit}' /proc/stat)
  echo "$q $t steal_jiffies=$((e - s))"
done
