#!/bin/bash
# Round-11 scale-probe queue (VERDICT r10 items #1, #4, #5, #7).
# Sequential — each probe owns the 32 cpus for a clean ledger row.
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
# 1. The weak-clearing row: composed Leiden at scale 22 on the STANDARD 32g
#    heap, on the serialized-checkpoint + shared-base binary.
run leiden22 leiden 22 16 32
# 2. Walk-family median-of-3 at scale 20 (uniform / biased / node2vec).
run walks20 walks 20 16 32
# 3. Last inferred-only centrality rows + the fast-coloring scale row.
run cent20 centrality2,colorfast 20 16 32
echo "QUEUE PHASE 1 COMPLETE" >> $OUT/queue.log
