"""Energy pipeline tests: diffusion-step exactness vs numpy, full
build_energy/search_energy behavior (golden-pinned, SURVEY §2 G12-G15)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.params import EnergyParams, GraphParams
from pyarrowspace_spark.operators import knn as knn_ops
from pyarrowspace_spark.operators import energy as E

from .conftest import TEST0_ITEMS

GP = GraphParams(eps=0.05, k=5, topk=3, p=2.0, sigma=0.05)


@pytest.fixture(scope="module")
def edges(test0_items_df):
    return knn_ops.knn_edges(test0_items_df, GP, strategy="exact").persist()


def test_diffusion_step_matches_numpy(spark, test0_items_df, edges):
    eta = 0.1
    out = E.diffusion_step(test0_items_df, edges, eta)
    got = {r["item_id"]: np.array(r["features"])
           for r in out.collect()}

    # numpy ground truth: x' = x - eta * L x
    X = np.array(TEST0_ITEMS)
    rows = edges.collect()
    n = len(X)
    W = np.zeros((n, n))
    for r in rows:
        W[r["src"], r["dst"]] = r["weight"]
        W[r["dst"], r["src"]] = r["weight"]
    L = np.diag(W.sum(1)) - W
    expect = X - eta * (L @ X)
    for i in range(n):
        np.testing.assert_allclose(got[i], expect[i], rtol=1e-12)


def test_diffusion_reduces_dirichlet_energy(spark, test0_items_df, edges):
    """Heat diffusion must not increase the graph Dirichlet energy
    Σ w_ij ||x_i - x_j||² (physics sanity)."""
    rows = edges.collect()
    X0 = np.array(TEST0_ITEMS)
    diffused = E.diffuse(test0_items_df, edges, eta=0.1, steps=3)
    X1r = {r["item_id"]: np.array(r["features"]) for r in diffused.collect()}
    X1 = np.stack([X1r[i] for i in range(len(X0))])

    def dirichlet(X):
        return sum(r["weight"] * np.sum((X[r["src"]] - X[r["dst"]]) ** 2)
                   for r in rows)

    assert dirichlet(X1) < dirichlet(X0)


@pytest.fixture(scope="module")
def energy_index(spark):
    from pyarrowspace_spark.sources.loaders import items_from_embeddings

    items = items_from_embeddings(spark, "/root/testdata/sf0.001").select(
        "item_id", "features"
    )
    return E.build_energy(
        items,
        EnergyParams(optical_tokens=16, eta=0.05, steps=2, trim_quantile=0.1),
        GraphParams(eps=0.9, k=10, topk=10, p=2.0),
    )


def test_build_energy_shapes(energy_index):
    n_nodes = energy_index.nnodes
    assert 2 <= n_nodes <= 40  # ~optical_tokens, + splits
    cols = set(energy_index.centroids.columns)
    assert {"centroid_id", "n_members", "lambda_c", "e_c", "center"} <= cols
    assert energy_index.items.filter(F.col("lambda").isNull()).count() == 0


def test_search_energy_topk(energy_index):
    row = energy_index.items.filter(F.col("item_id") == 7).first()
    q = np.array(row["features"])
    hits = E.search_energy(energy_index, q, k=5)
    got = hits.orderBy("rank").collect()
    assert len(got) == 5
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # query equals item 7's diffused vector -> identical lambda/e ->
    # maximal score w_l*1 + w_d*1 for item 7 itself
    assert got[0]["item_id"] == 7


def test_energy_deterministic(energy_index, spark):
    from pyarrowspace_spark.sources.loaders import items_from_embeddings

    items = items_from_embeddings(spark, "/root/testdata/sf0.001").select(
        "item_id", "features"
    )
    idx2 = E.build_energy(
        items,
        EnergyParams(optical_tokens=16, eta=0.05, steps=2, trim_quantile=0.1),
        GraphParams(eps=0.9, k=10, topk=10, p=2.0),
    )
    a = {(r["centroid_id"], r["n_members"])
         for r in energy_index.centroids.collect()}
    b = {(r["centroid_id"], r["n_members"]) for r in idx2.centroids.collect()}
    assert a == b


def test_diffuse_tiers_agree(spark, test0_items_df, edges, monkeypatch):
    """The broadcast tier (narrow-edge shuffle + broadcast X) and the
    distributed tier (array-message dataflow) are physical plans for
    the same operator; multi-step outputs must agree to fp noise."""
    a = E.diffuse(test0_items_df, edges, eta=0.1, steps=3)
    got_a = {r["item_id"]: np.array(r["features"]) for r in a.collect()}
    # force the beyond-broadcast tier
    monkeypatch.setattr(E, "DIFFUSE_BROADCAST_MAX_BYTES", 0)
    b = E.diffuse(test0_items_df, edges, eta=0.1, steps=3)
    got_b = {r["item_id"]: np.array(r["features"]) for r in b.collect()}
    assert set(got_a) == set(got_b)
    for i in got_a:
        np.testing.assert_allclose(got_a[i], got_b[i], rtol=1e-9)
