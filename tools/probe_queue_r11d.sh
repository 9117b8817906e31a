#!/bin/bash
# Round-11 phase 2 (revised): centrality rows, then the k-truss regime A/B
# the 2124.9s truss20 surprise demands — same binary, same session:
#   trussB = r10 shape (no core pre-restriction, incremental-only rounds)
#   trussA = r11 default (core pre-restriction + bulk recompute @0.25)
# truss22 is dropped: the regime decision must be settled at 20 first.
cd /root/repo
export GRAFT_CP=/tmp/probe_classes3
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
run cent20 centrality2,colorfast 20 16 32
GRAFT_TRUSS_DEBUG=1 GRAFT_TRUSS_NOCORE=1 run trussB trussinc 20 16 32
GRAFT_TRUSS_DEBUG=1 run trussA truss 20 16 32
echo "QUEUE2 COMPLETE" >> $OUT/queue.log
