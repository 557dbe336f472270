"""Scale-path contract (SURVEY §7.3 #2): the LSH-approximated λτ-graph
must recover ≥0.95 of the exact graph's edges at reference-like
parameters — the documented guarantee for switching strategies above
the broadcastable-N ceiling."""

import pyspark.sql.functions as F

from pyarrowspace_spark.operators import knn as KNN
from pyarrowspace_spark.params import GraphParams
from pyarrowspace_spark.sources import loaders

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_edge_recall_vs_exact(spark):
    """Band-LSH (bits, bands) are corpus knobs: recall for a pair at
    angle θ is 1-(1-(1-θ/π)^bits)^bands. The testdata embeddings are a
    HARD regime (64-dim, kNN at cos≈0.23-0.43) so the test pins few
    bits / many bands; the bench synth corpus exercises the realistic
    clustered regime (cos_nn≈0.9) where the default bits prune hard."""
    items = loaders.items_from_embeddings(spark, SF_DIR).select(
        "item_id", "features")
    params = GraphParams(eps=0.99, k=10, topk=10, p=2.0, sigma=0.495)
    exact = KNN.knn_edges(items, params, strategy="exact").select(
        "src", "dst").persist()
    lsh = KNN.knn_edges(items, params, strategy="lsh", lsh_bits=3,
                        lsh_bands=24).select("src", "dst").persist()
    n_exact = exact.count()
    n_hit = exact.join(lsh, ["src", "dst"]).count()
    assert n_exact > 0
    recall = n_hit / n_exact
    assert recall >= 0.95, f"LSH edge recall {recall:.3f} < 0.95"


def test_lsh_bucket_gemm_matches_sql_fold(spark):
    """The Arrow-gemm bucket path must agree with the pure-expression
    sequential fold (what the DuckDB oracle replays) on every vector."""
    from pyarrowspace_spark.operators import simsearch as S

    items = loaders.items_from_embeddings(spark, SF_DIR).select(
        "item_id", "features")
    planes = S.lsh_hyperplanes(64)
    cols = ["item_id"] + [f"bucket_{t}" for t in range(planes.shape[0])]
    fast = {r["item_id"]: tuple(r[c] for c in cols[1:])
            for r in S.with_lsh_buckets(items, planes).select(cols).collect()}
    slow = {r["item_id"]: tuple(r[c] for c in cols[1:])
            for r in S.with_lsh_buckets_sql(items, planes).select(cols).collect()}
    assert fast == slow


def test_builder_lsh_strategy_end_to_end(spark):
    """The 100TB path, driven end to end: build the index with LSH
    candidate generation and search it — λ materialized for every
    item, self-query returns itself first."""
    import numpy as np
    from pyarrowspace_spark.builder import ArrowSpaceBuilder
    from pyarrowspace_spark.operators.search import search

    items = loaders.items_from_embeddings(spark, SF_DIR).select(
        "item_id", "features")
    idx = ArrowSpaceBuilder.build(
        items, {"eps": 0.99, "k": 10, "topk": 10, "p": 2.0},
        strategy="lsh")
    assert idx.items.filter(F.col("lambda").isNull()).count() == 0
    q = np.array(items.filter("item_id = 7").first()["features"]) * 1.05
    hits = search(idx.items, idx.feature_laplacian, q, tau=0.62,
                  k=5).orderBy("rank").collect()
    assert len(hits) == 5
    assert hits[0]["item_id"] == 7


def test_auto_strategy_thresholds(spark):
    # below the ceiling auto == exact (broadcast scan); the constant
    # itself is the scale-path switch documented in knn_edges.
    assert KNN.EXACT_PATH_MAX_ROWS >= 10_000
