#!/bin/bash
# Round-13 chain, part 2 — supersedes measure_r13_chain.sh after its
# legs 1-2 (2M build+recall, 2M diffusion). Changes from part 1:
#   - NO bulk scratch cleanup between legs: part 1's clean_scratch
#     `rm blockmgr-*` was root-caused as the r12 driver-bench killer
#     (it deleted a CONCURRENT process's live shuffle files —
#     reproduced in-session). Per-process run-<pid> scratch subdirs
#     (session.scratch_run_dir) now make every process self-cleaning;
#     dead runs are reaped by pid-liveness at the next start.
#   - Leg order puts the 2M ANN-recall phase FIRST (verdict task 1):
#     fresh JVM + λ rebuild from the saved graph, so the search
#     phases get the whole scratch headroom that two in-process
#     attempts (r12, r13 leg 1) did not have.
set -u
cd /root/repo

export SPARK_GRAFT_SCRATCH_DIR=/root/repo/.sparkscratch
mkdir -p "$SPARK_GRAFT_SCRATCH_DIR"

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

wait_quiet
echo "=== leg A: 2M ANN recall from saved graph (fresh JVM) $(date) ==="
M1M_N=2000000 M1M_TAG=r13ann M1M_EDGES_PATH=$EDGES2M \
  M1M_ANN_PHASE=1 M1M_SKIP_ENERGY=1 M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m2mann_r13.log 2>&1
echo "legA exit $? $(date)"

wait_quiet
echo "=== leg A2: 2M distributed diffusion from saved graph $(date) ==="
M1M_N=2000000 M1M_TAG=r13dd M1M_EDGES_PATH=$EDGES2M \
  M1M_DIFFUSE_DIST_STEPS=2 M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  SPARK_GRAFT_DIFFUSE_CHUNK_MSG_BYTES=8589934592 \
  python scripts/measure_1m.py > /tmp/m2mdd_r13.log 2>&1
echo "legA2 exit $? $(date)"

wait_quiet
echo "=== leg B: 313k λ-gather A/B — collect+unsorted (r12 behavior) $(date) ==="
M1M_N=313841 M1M_TAG=r13collect M1M_DD_ONLY=1 \
  SPARK_GRAFT_LF_X_SOURCE=collect SPARK_GRAFT_LF_GATHER_SORT=0 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r13collect.log 2>&1
echo "legB exit $? $(date)"

wait_quiet
echo "=== leg C: 313k λ-gather A/B — scan-spool+sorted (r13) + recall $(date) ==="
M1M_N=313841 M1M_TAG=r13 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r13.log 2>&1
echo "legC exit $? $(date)"

wait_quiet
echo "=== leg D: 800k re-anchor, two recall seeds $(date) ==="
M1M_N=800000 M1M_TAG=r13 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  M1M_RECALL_SEEDS=7,1013 M1M_SAVE_EDGES=$EDGES800K \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m800k_r13.log 2>&1
echo "legD exit $? $(date)"

wait_quiet
echo "=== leg E: quiet bench.py self-run $(date) ==="
python bench.py > /tmp/bench_r13_self.log 2>&1
rc=$?
if [ $rc -eq 0 ]; then
  tail -1 /tmp/bench_r13_self.log > /root/repo/BENCH_r13_self.json
fi
echo "legE exit $rc $(date)"

echo "=== chain2 done $(date) ==="
