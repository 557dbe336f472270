"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

The BASELINE anchor (BASELINE.md) is index-build throughput
(~420 items/s at N=314k F=384 single-node) plus interactive search;
`extra.build_items_per_sec` reports our equivalent.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from pyarrowspace_spark.session import get_spark
from pyarrowspace_spark.builder import ArrowSpaceBuilder
from pyarrowspace_spark.operators.search import search, brute_force_cosine_topk
from pyarrowspace_spark.sources import loaders
import __spark_entry__ as entry_mod


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("pyarrowspace-bench")
    entry_mod._ship_package(spark)

    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # --- index build (the BASELINE throughput anchor) ---------------------
    items = loaders.items_from_embeddings(spark, sf_dir).select(
        "item_id", "features"
    )
    n_items = items.count()
    # Warm Python workers / Arrow / codegen on a tiny slice so the
    # timed build measures steady-state throughput, not JVM+worker
    # cold start (which a long-running cluster never pays per job).
    warm = ArrowSpaceBuilder.build(
        items.limit(64), {"eps": 0.99, "k": 5, "topk": 5, "p": 2.0})
    warm.items.count(); warm.edges.count()
    warm.items.unpersist(); warm.edges.unpersist()
    idx = timed("index_build", lambda: ArrowSpaceBuilder.build(
        items, {"eps": 0.99, "k": 10, "topk": 10, "p": 2.0}
    ))
    # force full materialization of lambda + edges
    timed("index_materialize", lambda: (idx.items.count(), idx.edges.count()))
    build_sec = timings["index_build"] + timings["index_materialize"]
    extra["build_items_per_sec"] = round(n_items / build_sec, 1)
    extra["n_items"] = n_items

    # --- lambda-aware search (3 queries x tau=0.62, like the reference
    #     CVE harness: 3 queries x 3 tau values interactive) --------------
    qrows = items.filter(F.col("item_id").isin([3, 7, 11])).collect()
    qvecs = np.array([r["features"] for r in qrows]) * 1.05
    # untimed: compile the search plan once (steady-state, as above)
    search(idx.items, idx.feature_laplacian, qvecs[:1], tau=0.9, k=3).collect()
    for tau in (1.0, 0.8, 0.62):
        timed(f"search_tau_{tau}", lambda t=tau: search(
            idx.items, idx.feature_laplacian, qvecs, tau=t, k=10
        ).collect())

    # --- headline operator queries (same code path as the driver) --------
    qs = entry_mod.queries()
    names = [
        "cosine_topk", "knn_graph_edges", "ir_quality_labels",
        "pricing_summary", "top_customers", "events_hourly", "events_asof",
        "sessionize", "dedup_exact", "text_stats", "minhash_signatures",
        "minhash_band_pairs", "ngram_jaccard", "simhash",
        "embedding_near_dups", "ann_lsh_topk", "random_projection",
        "lang_id", "media_frame_sample", "intrinsic_dim",
    ]
    # Same steady-state rationale as the build warm-up above: run each
    # query once at the smallest SF so Catalyst/janino codegen and
    # Python workers are hot, then time the real SF. A long-running
    # cluster compiles a recurring query once, not per run.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(os.path.join(warm_dir)) and warm_dir != sf_dir:
        for name in names:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite").save()
    for name in names:
        timed(name, lambda n=name: qs[n](spark, sf_dir).write.format(
            "noop").mode("overwrite").save())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "pyarrowspace-spark headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
