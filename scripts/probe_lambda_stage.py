"""Localize the λ-Laplacian gather-stage cost (r11 open question).

BENCH_313k_r11b.json sid63 ("collect at .../lambda_index.py", 32 tasks,
zero input/shuffle bytes) cost 12,705 task-sec at N=313k while a
microbenchmark prices edge_partials' math + the 0.9 GiB broadcast
unpickle at ~40 s total — ~300x unexplained. This probe rebuilds a
smaller corpus through the SAME builder path and dumps every completed
stage with full (untruncated) names plus the task-time split the group
records don't carry (executorDeserializeTime — where TorrentBroadcast
value fetch shows up — vs executorRunTime), so the overrun's location
becomes data.

Usage: python scripts/probe_lambda_stage.py   [PROBE_N=80000]
Writes /tmp/lambda_stage_probe.json; exclusive-run like measure_1m.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_NUM_THREADS", "32")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "32")

from pyarrowspace_spark.builder import ArrowSpaceBuilder
from pyarrowspace_spark.session import get_spark
from pyarrowspace_spark.sources.synth import ensure_clustered_corpus


def stages_full(spark) -> list[dict]:
    import urllib.request

    url = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
    app_id = app[0]["id"]
    sts = json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app_id}/stages?status=complete"))
    out = []
    for st in sts:
        out.append({
            "sid": st["stageId"],
            "name": st.get("name", ""),
            "num_tasks": st.get("numTasks", 0),
            "run_sec": round(st.get("executorRunTime", 0) / 1e3, 1),
            "deser_sec": round(
                st.get("executorDeserializeTime", 0) / 1e3, 1),
            "cpu_sec": round(st.get("executorCpuTime", 0) / 1e9, 1),
            "sched_delay_probe": None,
            "shuffle_read_gb": round(
                st.get("shuffleReadBytes", 0) / 2**30, 3),
            "input_gb": round(st.get("inputBytes", 0) / 2**30, 3),
        })
    return sorted(out, key=lambda s: -s["run_sec"])


def main() -> None:
    n = int(os.environ.get("PROBE_N", "80000"))
    spark = get_spark("lambda-stage-probe")
    import __spark_entry__ as entry_mod

    entry_mod._ship_package(spark)
    path = ensure_clustered_corpus(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".benchdata"), n=n, f=384)
    big = spark.read.parquet(path).select("item_id", "features")
    t0 = time.time()
    idx = ArrowSpaceBuilder.build(
        big, {"eps": 0.99, "k": 25, "topk": 15, "p": 2.0},
        strategy="lsh")
    idx.items.count(), idx.edges.count()
    build = round(time.time() - t0, 1)
    out = {"n": n, "build_sec": build, "stages": stages_full(spark)[:20]}
    with open("/tmp/lambda_stage_probe.json", "w") as fh:
        json.dump(out, fh, indent=1)
    for s in out["stages"][:12]:
        print(s["sid"], s["num_tasks"], "run", s["run_sec"],
              "cpu", s["cpu_sec"], "deser", s["deser_sec"],
              s["name"][-70:])
    spark.stop()


if __name__ == "__main__":
    main()
