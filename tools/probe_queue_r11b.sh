#!/bin/bash
# Round-11 phase 2: k-truss on the NEW regime binary (core pre-restriction
# + bulk-round recompute) — price the fix at 20 against the r10 1317.0s
# row, then attempt the scale-22 row (VERDICT r10 item #5).
cd /root/repo
cp -r target/scala-2.13/classes /tmp/probe_classes2
export GRAFT_CP=/tmp/probe_classes2
export SPARK_DRIVER_MEM=32g
export GRAFT_TRUSS_DEBUG=1
OUT=/tmp/probe_r11
mkdir -p $OUT
run() {
  local name="$1"; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> $OUT/queue.log
  tools/run_main.sh graft.tools.ScaleProbe "$@" \
    > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> $OUT/queue.log
}
run truss20 truss 20 16 32
run truss22 truss 22 16 32
echo "QUEUE PHASE 2 COMPLETE" >> $OUT/queue.log
