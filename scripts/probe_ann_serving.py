"""r14 probe: the 32-core ANN-serving blowup (VERDICT r13 item 2).

Driver ground truth: lsh_ann_search_at_scale 79 s / 50q 97 s at 32
cores vs 3.6 / 5.3 s at 8 cores in the same window — while the SAME
search_ann code over the saved parquet table ran 11 s. This probe
replays exactly the bench's serving shapes from the already-saved
hashed table (.benchdata/hashed_n78580):

  mem_*    — search_ann over a PERSISTED in-memory frame (the bench's
             `hashed` shape)
  saved_*  — search_ann over the plain parquet re-read (the bench's
             `reopened` shape, minus bucketing metadata)

Usage: SPARK_GRAFT_CPUS=32 python scripts/probe_ann_serving.py
Writes /tmp/ann_probe_c$CPUS.json. Run exclusively.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("OMP_NUM_THREADS", _CPUS)
os.environ.setdefault("OPENBLAS_NUM_THREADS", _CPUS)

import numpy as np


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from pyarrowspace_spark.operators.search import search_ann
    from pyarrowspace_spark.operators.simsearch import (auto_lsh_tables,
                                                        lsh_hyperplanes)
    from pyarrowspace_spark.session import get_spark, scratch_run_dir
    from scripts.probe_r13opt_phases import stages_full

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = scratch_run_dir(os.path.join(repo, ".sparkscratch"))
    spark = get_spark("ann-probe", extra_conf={
        "spark.io.compression.codec": "zstd",
        "spark.local.dir": scratch,
        **{f"spark.executorEnv.{v}": "1"
           for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                     "MKL_NUM_THREADS")},
    })
    entry_mod._ship_package(spark)
    n = 78580
    saved_dir = os.path.join(repo, ".benchdata", f"hashed_n{n}")
    corpus = os.path.join(
        repo, ".benchdata", "synth_n78580_f384_c200_s0.45_x12.0_seed42.parquet")
    n_tables = auto_lsh_tables(n_planes=10, target_recall=0.95, n_items=n)
    planes = lsh_hyperplanes(384, n_tables=n_tables, n_planes=10)
    # timing probe only: lf shapes the q_lambda VALUE, not the plan;
    # identity keeps lambda_for_vectors finite
    lf = np.eye(384, dtype=np.float64)

    big = spark.read.parquet(corpus).select("item_id", "features")
    qn = 50
    qrows = (big.filter(F.col("item_id") < 5 * qn)
             .orderBy("item_id").limit(qn).collect())
    qmat = np.array([r["features"] for r in qrows]) * 1.05
    qdf1 = spark.createDataFrame(
        [(0, [float(v) for v in qmat[0]])],
        schema="query_id long, features array<double>")
    qdf50 = spark.createDataFrame(
        [(int(i), [float(v) for v in qmat[i]]) for i in range(len(qmat))],
        schema="query_id long, features array<double>")

    timers: dict[str, float] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        timers[name] = round(time.time() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        print(f"[probe] {name}: {timers[name]}s", flush=True)
        return out

    hashed_mem = spark.read.parquet(saved_dir).persist()
    timed("cache_materialize", lambda: hashed_mem.count())
    print("[probe] mem partitions:", hashed_mem.rdd.getNumPartitions())
    # bench-lineage suspect: a cache with FEW partitions serializes the
    # whole corpus-side pipeline (HOF norms + posexplode + probe join)
    hashed_mem1 = spark.read.parquet(saved_dir).repartition(1).persist()
    timed("cache1_materialize", lambda: hashed_mem1.count())
    timed("mem1_50q", lambda: search_ann(
        hashed_mem1, lf, qdf50, tau=0.62, k=15, planes=planes).collect())
    hashed_mem1.unpersist()
    timed("mem_1q_cold", lambda: search_ann(
        hashed_mem, lf, qdf1, tau=0.62, k=15, planes=planes).collect())
    timed("mem_1q", lambda: search_ann(
        hashed_mem, lf, qdf1, tau=0.62, k=15, planes=planes).collect())
    timed("mem_50q", lambda: search_ann(
        hashed_mem, lf, qdf50, tau=0.62, k=15, planes=planes).collect())
    saved = spark.read.parquet(saved_dir)
    timed("saved_50q", lambda: search_ann(
        saved, lf, qdf50, tau=0.62, k=15, planes=planes).collect())
    timed("saved_1q", lambda: search_ann(
        saved, lf, qdf1, tau=0.62, k=15, planes=planes).collect())
    timed("mem_50q_again", lambda: search_ann(
        hashed_mem, lf, qdf50, tau=0.62, k=15, planes=planes).collect())

    out = {"cpus": _CPUS, "timers": timers,
           "loadavg": [round(v, 2) for v in os.getloadavg()],
           "stages": stages_full(spark)[:40]}
    path = f"/tmp/ann_probe_c{_CPUS}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(timers, indent=1))
    for s in out["stages"][:25]:
        print(s["sid"], s["num_tasks"], "wall", s["wall"], "run",
              s["run_sec"], "cpu", s["cpu_sec"], "|", s["desc"][:30],
              "|", s["name"][:60])
    spark.stop()


if __name__ == "__main__":
    main()
