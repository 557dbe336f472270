#!/bin/bash
# Round-11 measurement chain, part 2 (legs 2-4) — relaunched after the
# subset-hash change (make_hash_bands(band_subset)) was tested between
# legs, so the 2M/1M/800k artifacts carry the per-group subset hashing
# while BENCH_313k_r11b.json is the repartition-fix-only datapoint.
# Run EXCLUSIVELY (no pytest/bench concurrently).
set -u
cd /root/repo

clean_scratch() {
  rm -rf /tmp/blockmgr-* /tmp/spark-* /tmp/pyarrowspace-lshpairs-* 2>/dev/null
  sync
}

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
echo "=== chain part 2 done $(date) ==="
