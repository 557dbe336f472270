"""r13 optimization-round pins: the narrow-shuffle LSH plan and the
hoisted Laplacian diagonal must be value-identical to the plans they
replace."""

import numpy as np
import pytest

from pyarrowspace_spark.operators import knn as K
from pyarrowspace_spark.params import GraphParams


def _corpus(spark, n=700, f=24, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((5, f))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = centers[rng.integers(0, 5, n)] + 0.08 * rng.standard_normal((n, f))
    X *= 12.0
    return spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        schema="item_id long, features array<double>")


def test_narrow_shuffle_lsh_identical_to_vector_plan(spark, monkeypatch):
    """The U-spool narrow-shuffle plan (shuffle (band, key, id), gather
    vectors from the id-sorted float32 spool) must emit the IDENTICAL
    edge list — src, dst, AND dist bit-for-bit — as the legacy
    vector-shuffle plan on the same corpus: `_normalize_f32` is the
    same op sequence the hash pass applies, so U bits cannot differ."""
    items = _corpus(spark)
    gp = GraphParams(eps=0.9, k=8, topk=8, p=2.0)
    narrow = {(r["src"], r["dst"]): r["dist"]
              for r in K.knn_edges(items, gp, strategy="lsh").collect()}
    assert K.lsh_group_summary() is not None  # narrow spools eagerly
    monkeypatch.setenv("SPARK_GRAFT_LSH_SHUFFLE", "vector")
    legacy = {(r["src"], r["dst"]): r["dist"]
              for r in K.knn_edges(items, gp, strategy="lsh").collect()}
    assert narrow == legacy and len(narrow) > 0


def test_narrow_shuffle_skew_guard_identical(spark, monkeypatch):
    """Oversized-bucket block splitting under the narrow plan (spool
    gather in block-pair tasks) matches the legacy plan on a
    mass-duplicate corpus."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)] + [
        (100 + i, [float(x) for x in v])
        for i, v in enumerate(np.eye(4)[1:] * 1.0)]
    df = spark.createDataFrame(
        rows, schema="item_id long, features array<double>")
    gp = GraphParams(eps=0.9, k=5, topk=5, p=2.0)
    monkeypatch.setattr(K, "LSH_BUCKET_MAX", 8)
    narrow = {(r["src"], r["dst"]) for r in K.knn_edges(
        df, gp, strategy="lsh", lsh_bits=4, lsh_bands=4).collect()}
    monkeypatch.setenv("SPARK_GRAFT_LSH_SHUFFLE", "vector")
    legacy = {(r["src"], r["dst"]) for r in K.knn_edges(
        df, gp, strategy="lsh", lsh_bits=4, lsh_bands=4).collect()}
    assert narrow == legacy and len(narrow) > 0


def test_gather_diag_hoist_matches_driver_tier(spark):
    """feature_laplacian's gather tier (diagonal now one driver gemm +
    SQL degree aggregate) still agrees with the driver-BLAS tier."""
    from pyarrowspace_spark.operators import lambda_index as LAM

    items = _corpus(spark, n=300, f=16, seed=11)
    gp = GraphParams(eps=0.9, k=6, topk=6, p=2.0)
    edges = K.knn_edges(items, gp, strategy="exact").persist()
    lf_driver = LAM.feature_laplacian(items, edges, 16)
    # force the gather tier by dropping the driver-tier row ceiling
    import pyarrowspace_spark.operators.knn as KM
    old = KM.EXACT_PATH_MAX_ROWS
    try:
        KM.EXACT_PATH_MAX_ROWS = 0
        lf_gather = LAM.feature_laplacian(items, edges, 16)
    finally:
        KM.EXACT_PATH_MAX_ROWS = old
    edges.unpersist()
    assert np.allclose(lf_gather, lf_driver, rtol=1e-9, atol=1e-9)
    assert float(np.abs(lf_gather).max()) > 0
