#!/bin/bash
# SUPERSEDED by measure_r13_chain2.sh after legs 1-2 ran. DO NOT RUN:
# clean_scratch's bulk `rm blockmgr-*` below was root-caused as the
# r12 driver-bench killer — it deletes a CONCURRENT Spark process's
# live shuffle files (reproduced in-session; it killed this chain's
# own leg 2 that way). Kept verbatim as the record of what produced
# BENCH_2000k_r13.json (leg 1). Per-process scratch subdirs
# (session.scratch_run_dir) made the cleanup unnecessary AND unsafe
# to imitate.
#
# Round-13 measurement chain — run EXCLUSIVELY (no pytest/bench while
# it runs). Legs in verdict-priority order:
#   1. 2M full anchor w/ SAVED edges          -> BENCH_2000k_r13.json
#      The r13 headline (verdict task 1): build + M1M_SAVE_EDGES +
#      DISTRIBUTED edge recall (task 8) + the ANN top-k recall phase
#      the r12 disk watchdog ate — now with GC between every
#      sub-phase and no diffusion stacked in the same process.
#   2. 2M distributed diffusion from the saved graph (task 2, open
#      since r11)                             -> BENCH_2000k_r13dd.json
#      Fresh JVM = clean scratch; the saved-graph path skips the
#      ~90 min rebuild. Params sidecar asserted at load.
#   3. 313k λ-gather A/B in ONE host window (task 6):
#      a. collect+unsorted (r12 behavior)     -> BENCH_313k_r13collect.json
#      b. scan-spool+sorted (r13 default) + edge recall
#                                             -> BENCH_313k_r13.json
#   4. 800k re-anchor, TWO recall seeds on one build (task 7)
#                                             -> BENCH_800k_r13.json
#   5. quiet bench.py self-run                -> BENCH_r13_self.json
#
# Legs gate on loadavg < 2 (r12 verdict task 5: the 800k r12 leg
# started at loadavg 15.6 behind the 2M leg's tail — self-contention
# was the second-largest noise source). 20-min timeout, recorded
# either way; each artifact already records loadavg_start itself.
set -u
cd /root/repo

export SPARK_GRAFT_SCRATCH_DIR=/root/repo/.sparkscratch
mkdir -p "$SPARK_GRAFT_SCRATCH_DIR"

clean_scratch() {
  rm -rf "$SPARK_GRAFT_SCRATCH_DIR"/blockmgr-* \
         "$SPARK_GRAFT_SCRATCH_DIR"/spark-* \
         "$SPARK_GRAFT_SCRATCH_DIR"/pyarrowspace-* \
         /tmp/blockmgr-* /tmp/spark-* /tmp/pyarrowspace-lshpairs-* 2>/dev/null
  sync
}

wait_quiet() {
  local deadline=$((SECONDS + 1200))
  while :; do
    la=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "import sys; sys.exit(0 if $la < 2.0 else 1)"; then
      echo "loadavg gate: $la OK $(date)"; return
    fi
    if [ $SECONDS -ge $deadline ]; then
      echo "loadavg gate: TIMEOUT at $la $(date) (proceeding)"; return
    fi
    sleep 20
  done
}

EDGES2M=/root/repo/.benchdata/edges_n2000000_r13
EDGES800K=/root/repo/.benchdata/edges_n800000_r13

clean_scratch
wait_quiet
echo "=== leg 1: 2M full anchor (save edges + spark recall + ANN) $(date) ==="
M1M_N=2000000 M1M_TAG=r13 M1M_EDGE_RECALL=1 M1M_SKIP_ENERGY=1 \
  M1M_SAVE_EDGES=$EDGES2M M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_LSH_MIN_FREE=20g SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m2m_r13.log 2>&1
echo "leg1 exit $? $(date)"

clean_scratch
wait_quiet
echo "=== leg 2: 2M distributed diffusion from saved graph $(date) ==="
M1M_N=2000000 M1M_TAG=r13dd M1M_EDGES_PATH=$EDGES2M \
  M1M_DIFFUSE_DIST_STEPS=2 M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  SPARK_GRAFT_DIFFUSE_CHUNK_MSG_BYTES=8589934592 \
  python scripts/measure_1m.py > /tmp/m2mdd_r13.log 2>&1
echo "leg2 exit $? $(date)"

clean_scratch
wait_quiet
echo "=== leg 3a: 313k λ-gather A/B — collect+unsorted (r12 behavior) $(date) ==="
M1M_N=313841 M1M_TAG=r13collect M1M_DD_ONLY=1 \
  SPARK_GRAFT_LF_X_SOURCE=collect SPARK_GRAFT_LF_GATHER_SORT=0 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r13collect.log 2>&1
echo "leg3a exit $? $(date)"

clean_scratch
wait_quiet
echo "=== leg 3b: 313k λ-gather A/B — scan-spool+sorted (r13) + recall $(date) ==="
M1M_N=313841 M1M_TAG=r13 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r13.log 2>&1
echo "leg3b exit $? $(date)"

clean_scratch
wait_quiet
echo "=== leg 4: 800k re-anchor, two recall seeds $(date) ==="
M1M_N=800000 M1M_TAG=r13 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  M1M_RECALL_SEEDS=7,1013 M1M_SAVE_EDGES=$EDGES800K \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m800k_r13.log 2>&1
echo "leg4 exit $? $(date)"

clean_scratch
wait_quiet
echo "=== leg 5: quiet bench.py self-run $(date) ==="
python bench.py > /tmp/bench_r13_self.log 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  tail -1 /tmp/bench_r13_self.log > /root/repo/BENCH_r13_self.json
fi
echo "leg5 exit $rc $(date)"

clean_scratch
echo "=== chain done $(date) ==="
