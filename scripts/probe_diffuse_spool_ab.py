"""Same-window A/B: legacy array-message diffusion plan vs the r13
narrow-shuffle spool plan, on IDENTICAL inputs in one session (guide
§1: the host swings 2-7x between windows, so only in-window pairs are
comparable). Runs each plan twice in alternating order (L S S L) so
page-cache warmth cancels.

Usage: python scripts/probe_diffuse_spool_ab.py   [PROBE_N=78580]
Writes /tmp/diffuse_spool_ab.json.
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


def main() -> None:
    from pyarrowspace_spark.builder import ArrowSpaceBuilder
    from pyarrowspace_spark.session import get_spark, scratch_run_dir
    from pyarrowspace_spark.sources.synth import ensure_clustered_corpus
    from pyarrowspace_spark.operators import energy as energy_mod
    import __spark_entry__ as entry_mod

    n = int(os.environ.get("PROBE_N", "78580"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = scratch_run_dir(os.path.join(repo, ".sparkscratch"))
    spark = get_spark("diffuse-spool-ab", extra_conf={
        "spark.io.compression.codec": "zstd",
        "spark.local.dir": scratch,
        **{f"spark.executorEnv.{v}": "1"
           for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                     "MKL_NUM_THREADS")},
    })
    entry_mod._ship_package(spark)
    path = ensure_clustered_corpus(
        os.path.join(repo, ".benchdata"), n=n, f=384)
    big = spark.read.parquet(path).select("item_id", "features")
    bidx = ArrowSpaceBuilder.build(
        big, {"eps": 0.99, "k": 25, "topk": 15, "p": 2.0},
        strategy="lsh")
    edges = bidx.edges
    edges.count()

    ceil0 = energy_mod.DIFFUSE_BROADCAST_MAX_BYTES
    energy_mod.DIFFUSE_BROADCAST_MAX_BYTES = 0
    runs: list[dict] = []

    def one(plan: str) -> None:
        os.environ["SPARK_GRAFT_DIFFUSE_PLAN"] = plan
        spark.sparkContext._jvm.System.gc()
        st: list[float] = []
        spark.sparkContext.setJobDescription(f"diffuse-2step[{plan}]")
        t0 = time.time()
        energy_mod.diffuse(big, edges, eta=0.05, steps=2,
                           step_times=st).count()
        wall = round(time.time() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        info = dict(energy_mod._LAST_DIFFUSE_INFO or {})
        runs.append({"plan_req": plan, "plan_ran": info.get("plan"),
                     "wall": wall, "steps": st})
        print(f"[ab] {plan}: {wall}s steps={st} ran={info.get('plan')}",
              flush=True)

    try:
        for plan in ("shuffle", "auto", "auto", "shuffle"):
            one(plan)
    finally:
        energy_mod.DIFFUSE_BROADCAST_MAX_BYTES = ceil0
        os.environ.pop("SPARK_GRAFT_DIFFUSE_PLAN", None)
    out = {"n": n, "runs": runs,
           "loadavg": list(os.getloadavg())}
    with open("/tmp/diffuse_spool_ab.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
