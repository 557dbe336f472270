#!/bin/bash
# Round-12 measurement chain — run EXCLUSIVELY (no pytest/bench while
# it runs). Legs in verdict-priority order:
#   1. 313k build-only quiet re-pin (~8-13 min) -> BENCH_313k_r12.json
#      First 313k artifact with the fp32 X gather ship (the r11
#      postmortem's largest remaining stage: 31% of flagship wall was
#      32 tasks paging a 0.96 GB fp64 mmap; fp32 halves the bytes).
#      M1M_EDGE_RECALL adds the sampled exact-vs-LSH edge recall.
#   2. 2M full anchor (~90-120 min)            -> BENCH_2000k_r12.json
#      The round's headline: the first 2M artifact with MEASURED
#      ANN recall + edge recall (r11 verdict gap 1 — DD_ONLY skipped
#      the ANN phase) AND the 2M distributed-diffusion point (gap 2),
#      chained on the same built graph. M1M_SKIP_ENERGY keeps
#      build_energy's 4-step diffusion out (the per-step phase
#      measures diffusion directly); 8 GiB chunk budget halves the
#      per-slice peak vs the 1M point's 16 GiB (disk_free_start is
#      ~5 GB lower this round).
#   3. 800k build-only re-anchor (~16-36 min)  -> BENCH_800k_r12.json
#      fp32-gather datapoint at the throughput-record scale; the leg
#      we can afford to lose to the clock.
set -u
cd /root/repo

clean_scratch() {
  rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/pyarrowspace-lshpairs-* 2>/dev/null
  sync
}

clean_scratch
echo "=== leg 1: 313k re-pin (fp32 gather) $(date) ==="
M1M_N=313841 M1M_TAG=r12 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m313k_r12.log 2>&1
echo "leg1 exit $? $(date)"

clean_scratch
echo "=== leg 2: 2M full anchor (ANN+edge recall+diffusion) $(date) ==="
M1M_N=2000000 M1M_TAG=r12 M1M_EDGE_RECALL=1 M1M_SKIP_ENERGY=1 \
  M1M_DIFFUSE_DIST_STEPS=2 M1M_MIN_FREE_GB=13 \
  SPARK_GRAFT_LSH_MIN_FREE=20g SPARK_GRAFT_DRIVER_MEM=64g \
  SPARK_GRAFT_DIFFUSE_CHUNK_MSG_BYTES=8589934592 \
  python scripts/measure_1m.py > /tmp/m2m_r12.log 2>&1
echo "leg2 exit $? $(date)"

clean_scratch
echo "=== leg 3: 800k build-only re-anchor $(date) ==="
M1M_N=800000 M1M_TAG=r12 M1M_DD_ONLY=1 M1M_EDGE_RECALL=1 \
  SPARK_GRAFT_DRIVER_MEM=64g \
  python scripts/measure_1m.py > /tmp/m800k_r12.log 2>&1
echo "leg3 exit $? $(date)"

clean_scratch
echo "=== chain done $(date) ==="
