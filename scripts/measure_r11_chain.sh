#!/bin/bash
# Round-11 measurement chain — run EXCLUSIVELY (no pytest/bench while
# it runs; the r11 first 313k sample was polluted by a concurrent test
# suite and measured 799.9 s vs the 445.6 s r8 anchor).
#
# Legs, in verdict-priority order (flagship re-pin first, then the 2M
# survival run the round exists to prove, then the last diffusion
# doubling; the 800k re-anchor is last — it already has four committed
# artifacts, so it is the leg we can afford to lose to the clock):
#   1. 313k build-only quiet re-pin  (~13 min)  -> BENCH_313k_r11b.json
#      (first 313k artifact AFTER the hash-repartition fix — the
#      committed r11 sample measured the starved 8/32-parallel plan)
#   2. 2M build attempt              (~2h)      -> BENCH_2000k_r11.json
#      planner floor 20 GB > watchdog 13 GB: the adaptive group
#      planner governs; the watchdog is the backstop 7 GB below it.
#      First 2M attempt with the spool-time k-cap (r11a died in the
#      post-loop dedupe over 16 GB of uncapped spools).
#   3. 1M distributed-diffusion point (~80 min) -> BENCH_1M_r11.json
#   4. 800k build-only               (~36 min)  -> BENCH_800k_r11b.json
#      (re-anchor with num_tasks stage fields + capped spools)
set -u
cd /root/repo

clean_scratch() {
  rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/pyarrowspace-lshpairs-* 2>/dev/null
  sync
}

clean_scratch
echo "=== leg 1: 313k quiet re-pin $(date) ==="
M1M_N=313841 M1M_TAG=r11b M1M_DD_ONLY=1 SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r11b.log 2>&1
echo "leg1 exit $? $(date)"

clean_scratch
echo "=== leg 2: 2M build attempt $(date) ==="
M1M_N=2000000 M1M_TAG=r11 M1M_DD_ONLY=1 M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_LSH_MIN_FREE=20g SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m2m_r11.log 2>&1
echo "leg2 exit $? $(date)"

clean_scratch
echo "=== leg 3: 1M diffusion point $(date) ==="
M1M_N=1000000 M1M_TAG=r11 M1M_DD_ONLY=1 M1M_DIFFUSE_DIST_STEPS=2 \
  M1M_MIN_FREE_GB=13 SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m1m_r11.log 2>&1
echo "leg3 exit $? $(date)"

clean_scratch
echo "=== leg 4: 800k build-only $(date) ==="
M1M_N=800000 M1M_TAG=r11b M1M_DD_ONLY=1 SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m800k_r11b.log 2>&1
echo "leg4 exit $? $(date)"

clean_scratch
echo "=== chain done $(date) ==="
