#!/bin/bash
# Round-11 combined probe queue (remaining VERDICT r10 items #4, #5, #7).
# leiden22 already recorded (924.6s, commit 8e99eba). Sequential — each
# probe owns the 32 cpus for a clean ledger row.
cd /root/repo
export GRAFT_CP=/tmp/probe_classes
export SPARK_DRIVER_MEM=32g
OUT=/tmp/probe_r11
mkdir -p $OUT
run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> $OUT/queue.log
  tools/run_main.sh graft.tools.ScaleProbe "$@" \
    > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> $OUT/queue.log
}
# 1. Price the r11 k-truss fix at scale 20 against the r10 1317.0s row.
GRAFT_TRUSS_DEBUG=1 run truss20 truss 20 16 32
# 2. Walk-family median-of-3 at scale 20 (uniform / biased / node2vec).
run walks20 walks 20 16 32
# 3. Last inferred-only centrality rows + the fast-coloring scale row.
run cent20 centrality2,colorfast 20 16 32
# 4. The scale-22 truss attempt (longest / riskiest last).
GRAFT_TRUSS_DEBUG=1 run truss22 truss 22 16 32
echo "QUEUE COMPLETE" >> $OUT/queue.log
