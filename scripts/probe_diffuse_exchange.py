"""Focused A/B: diffusion message-exchange variants (r13-opt).

Builds the bench LSH graph once, then times one diffusion step under:
  a) repartition(n_groups=size-formula, dst) + mapInPandas   (current)
  b) repartition(shuffle.partitions, dst) + mapInPandas      (fewer, bigger blocks)
  c) groupBy(pmod(xxhash64(dst), n_groups)) + applyInPandas  (pre-r13 shape)

Also dumps task-time quantiles for the band-hash emission stage of the
LSH build (the 93 s wall / 101 task-sec trickle under investigation).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def rest(spark, path):
    url = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{url}/api/v1/applications"))
    return json.load(urllib.request.urlopen(
        f"{url}/api/v1/applications/{app[0]['id']}/{path}"))


def main() -> None:
    from pyarrowspace_spark.operators import energy as E
    from pyarrowspace_spark.operators import knn as K
    from pyarrowspace_spark.params import GraphParams
    from pyarrowspace_spark.session import get_spark, scratch_run_dir
    from pyarrowspace_spark.sources.synth import ensure_clustered_corpus
    import __spark_entry__ as entry_mod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scratch = scratch_run_dir(os.path.join(repo, ".sparkscratch"))
    spark = get_spark("diffuse-xchg-probe", extra_conf={
        "spark.io.compression.codec": "zstd",
        "spark.local.dir": scratch,
        **{f"spark.executorEnv.{v}": "1"
           for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                     "MKL_NUM_THREADS")},
    })
    entry_mod._ship_package(spark)
    path = ensure_clustered_corpus(os.path.join(repo, ".benchdata"),
                                   n=78580, f=384)
    big = spark.read.parquet(path).select("item_id", "features")
    gp = GraphParams(eps=0.99, k=25, topk=15, p=2.0)

    spark.sparkContext.setJobDescription("build edges")
    t0 = time.time()
    edges = K.knn_edges(big, gp, strategy="lsh").persist()
    n_edges = edges.count()
    print(f"edges built: {n_edges} in {time.time()-t0:.1f}s", flush=True)

    # hash-emission stage task quantiles (from the build just done)
    for st in rest(spark, "stages?status=complete"):
        if st.get("shuffleWriteBytes", 0) > 1 << 30:
            sid = st["stageId"]
            det = rest(spark, f"stages/{sid}/0/taskSummary"
                              "?quantiles=0.0,0.25,0.5,0.75,1.0")
            print(f"stage {sid} shw={st['shuffleWriteBytes']/2**30:.2f}GB "
                  f"wall-ish tasks={st['numTasks']}")
            for k in ("executorRunTime", "executorDeserializeTime",
                      "schedulerDelay", "shuffleWriteTime",
                      "executorCpuTime"):
                v = det.get(k)
                if v:
                    scale = 1e6 if k in ("shuffleWriteTime",
                                         "executorCpuTime") else 1.0
                    print(f"  {k}: "
                          f"{[round(x / 1e3 / scale, 2) for x in v]}")

    both = E._symmetrize(edges).repartition(32, "src").persist()
    n_sym = both.count()
    deg = both.groupBy(F.col("dst").alias("item_id")).agg(
        F.sum("weight").alias("_deg")).persist()
    deg.count()
    nf = 384
    rows_per_group = max(1, (64 << 20) // (8 * nf))
    n_groups = int(min(1 << 16, max(64, -(-n_sym // rows_per_group))))
    print(f"n_sym={n_sym} n_groups={n_groups}", flush=True)

    xf = F.col("features").cast("array<float>")
    msgs = both.join(
        big.select(F.col("item_id").alias("src"), xf.alias("_xf")),
        "src").select("dst", "weight", "_xf")

    def mapper(batches):
        # the rejected repartition+mapInPandas formulation, kept
        # inline so this A/B stays re-runnable
        Ms, ws, ds = [], [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Ms.append(np.stack(pdf["_xf"].to_numpy()).astype(
                np.float32, copy=False))
            ws.append(pdf["weight"].to_numpy(np.float32))
            ds.append(pdf["dst"].to_numpy(np.int64))
        if not Ms:
            return
        M = np.vstack(Ms) if len(Ms) > 1 else Ms[0]
        w = np.concatenate(ws) if len(ws) > 1 else ws[0]
        dstv = np.concatenate(ds) if len(ds) > 1 else ds[0]
        del Ms, ws, ds
        order = np.argsort(dstv, kind="stable")
        dsts, starts = np.unique(dstv[order], return_index=True)
        Msrt, wsrt = M[order], w[order]
        del M, w
        bnds = np.append(starts, len(dstv))
        nsum = np.empty((len(dsts), Msrt.shape[1]))
        for i in range(len(dsts)):
            s, e = bnds[i], bnds[i + 1]
            nsum[i] = wsrt[s:e] @ Msrt[s:e]
        for i0 in range(0, len(dsts), 4096):
            yield pd.DataFrame({"item_id": dsts[i0:i0 + 4096],
                                "_nsum": list(nsum[i0:i0 + 4096])})

    def run(tag, df):
        spark.sparkContext.setJobDescription(tag)
        sid0 = K._max_stage_id(spark)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        sts = K._stages_since(spark, sid0)
        tot = sum(s["task_sec"] for s in sts)
        shw = sum(s["shuffle_write_gb"] for s in sts)
        print(f"{tag}: wall={wall:.1f}s task_sec={tot:.0f} "
              f"shuffle_write={shw:.2f}GB", flush=True)
        for s in sts:
            print(f"   sid{s['sid']} wall={s['wall_sec']} "
                  f"ts={s['task_sec']} shw={s['shuffle_write_gb']} "
                  f"shr={s['shuffle_read_gb']}")

    schema = "item_id long, _nsum array<double>"
    run("a_map_ngroups", msgs.repartition(n_groups, "dst")
        .mapInPandas(mapper, schema))
    run("b_map_32", msgs.repartition(32, "dst").mapInPandas(mapper, schema))

    def _sum_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(pdf["_xf"].to_numpy()).astype(np.float32, copy=False)
        w = pdf["weight"].to_numpy(np.float32)
        dstv = pdf["dst"].to_numpy(np.int64)
        order = np.argsort(dstv, kind="stable")
        dsts, starts = np.unique(dstv[order], return_index=True)
        Ms, ws = M[order], w[order]
        bnds = np.append(starts, len(dstv))
        nsum = np.empty((len(dsts), M.shape[1]))
        for i in range(len(dsts)):
            s, e = bnds[i], bnds[i + 1]
            nsum[i] = ws[s:e] @ Ms[s:e]
        return pd.DataFrame({"item_id": dsts, "_nsum": list(nsum)})

    run("c_groupby_old", msgs.withColumn(
        "_g", F.pmod(F.xxhash64("dst"), F.lit(int(n_groups))))
        .groupBy("_g").applyInPandas(_sum_kernel, schema))
    run("a2_map_ngroups", msgs.repartition(n_groups, "dst")
        .mapInPandas(mapper, schema))
    spark.stop()


if __name__ == "__main__":
    main()
