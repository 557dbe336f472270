"""Round-5 contract fixes: save/load/extend normalise round-trip,
search_ann planes-fingerprint validation, CC convergence, CNM guard
without driver collect, Gopher most-common-word semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.builder import ArrowSpaceBuilder, ArrowSpaceIndex
from pyarrowspace_spark.operators import dedup as D
from pyarrowspace_spark.operators import quality as Q
from pyarrowspace_spark.operators import topology as TOP
from pyarrowspace_spark.operators.simsearch import (lsh_hyperplanes,
                                                    planes_fingerprint,
                                                    with_lsh_buckets)

GP = {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0, "normalise": True, "seed": 7}


def test_save_load_extend_normalise_roundtrip(spark, test0_items_df, tmp_path):
    """A normalise=True index saved, loaded, then extend()ed must apply
    the same normalization to the appended vectors (ADVICE r4 medium:
    load() used to drop normalise/seed from meta)."""
    idx = ArrowSpaceBuilder.build(test0_items_df, GP, strategy="exact")
    assert idx.params.normalise is True
    path = str(tmp_path / "idx")
    idx.save(path)
    back = ArrowSpaceIndex.load(spark, path)
    assert back.params.normalise is True
    assert back.params.seed == 7
    assert back.params.to_dict() == idx.params.to_dict()

    # extend with a SCALED copy of item 0: under normalise=True the
    # stored vector (and its e_raw/lambda) must equal item 0's exactly.
    new = test0_items_df.filter(F.col("item_id") == 0).select(
        F.lit(100).cast("long").alias("item_id"),
        F.transform("features", lambda x: x * F.lit(3.0)).alias("features"),
    )
    ext = ArrowSpaceBuilder.extend(back, new)
    rows = {r["item_id"]: r for r in
            ext.items.filter(F.col("item_id").isin(0, 100)).collect()}
    assert rows[100]["features"] == pytest.approx(rows[0]["features"])
    assert rows[100]["lambda"] == pytest.approx(rows[0]["lambda"])


def test_search_ann_rejects_mismatched_planes(spark, test0_items_df):
    from pyarrowspace_spark.operators.search import search_ann

    idx = ArrowSpaceBuilder.build(
        test0_items_df, {"eps": 0.9, "k": 4, "topk": 5, "p": 2.0},
        strategy="exact")
    planes_a = lsh_hyperplanes(24, n_tables=2, n_planes=4, seed=1)
    planes_b = lsh_hyperplanes(24, n_tables=2, n_planes=4, seed=2)
    assert planes_fingerprint(planes_a) != planes_fingerprint(planes_b)
    hashed = with_lsh_buckets(idx.items, planes_a)
    q = test0_items_df.limit(1).select(
        F.col("item_id").alias("query_id"), "features")
    # matching planes: runs
    ok = search_ann(hashed, idx.feature_laplacian, q, tau=0.9, k=3,
                    planes=planes_a)
    assert ok.count() > 0
    # different planes: must error, not silently return wrong candidates
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        search_ann(hashed, idx.feature_laplacian, q, tau=0.9, k=3,
                   planes=planes_b)
    # wrong table count: must error
    planes_3t = lsh_hyperplanes(24, n_tables=3, n_planes=4, seed=1)
    with pytest.raises(ValueError, match="bucket"):
        search_ann(hashed, idx.feature_laplacian, q, tau=0.9, k=3,
                   planes=planes_3t)


def test_connected_components_chain_converges(spark):
    """A 20-link chain of dups collapses to ONE component with
    iters=None (convergence mode), even though the default 8-hop bound
    alone could not cover the diameter."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long")
    out = D.connected_components(pairs, iters=None)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}
    assert out.count() == 21
    # bounded mode still bounds: 3 iterations cannot span 20 hops
    bounded = D.connected_components(pairs, iters=3)
    assert bounded.filter(F.col("component") == 0).count() < 21


def test_connected_components_early_exit_same_result(spark):
    """Early convergence exit returns the identical fixed point the
    fixed-iteration unroll reaches (oracle parity guarantee)."""
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (9, 9)], "id_a long, id_b long")
    a = sorted(map(tuple, D.connected_components(pairs, iters=8).collect()))
    b = sorted(map(tuple, D.connected_components(pairs, iters=None).collect()))
    assert a == b


def test_dedup_keeplist_chain_single_survivor(spark):
    """Chain of 20 near-identical docs -> exactly one survivor with
    cc_iters=None (VERDICT r4 'Next round' #7)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    words = base.split()
    rows = []
    for i in range(20):
        # doc i shares a long overlap with doc i+1 only (sliding window)
        rows.append((i, " ".join(words[(i % 3):] + [f"tail{i} tail{i}"])))
    # make them genuinely chained: identical text pairs (i, i+1)
    rows = [(i, base + f" link{i // 2}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.dedup_keeplist(df, n=3, threshold=0.1, cc_iters=None)
    keep = [r["doc_id"] for r in out.filter("keep").collect()]
    assert keep == [0]


def test_greedy_modularity_guard_no_driver_collect(spark, monkeypatch):
    """The >max_nodes path must raise BEFORE any driver collect of the
    edge list (VERDICT r4 'What's wrong' #3)."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)],
        "src long, dst long, weight double")
    from pyspark.sql import DataFrame

    def no_collect(self):
        raise AssertionError("driver collect before the max_nodes guard")

    monkeypatch.setattr(DataFrame, "collect", no_collect)
    with pytest.raises(ValueError, match="max_nodes"):
        TOP.greedy_modularity_communities(edges, max_nodes=2)


def test_greedy_modularity_heap_matches_quality(spark):
    """Heap-based CNM still finds the planted two-community split."""
    intra = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5)]
    inter = [(2, 3)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in intra + inter],
        "src long, dst long, weight double")
    out = {r["node"]: r["community"] for r in
           TOP.greedy_modularity_communities(edges).collect()}
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4] == out[5]
    assert out[0] != out[3]
    q = TOP.modularity(edges, spark.createDataFrame(
        [(n, c) for n, c in out.items()], "node long, community long")
                       ).agg(F.sum("q_c")).collect()[0][0]
    assert q > 0.3


def test_gopher_most_common_word_not_char_mass(spark):
    """A long rare token must NOT out-score the most frequent word
    (ADVICE r4: metric drifted from the Rae et al. definition)."""
    df = spark.createDataFrame(
        [(0, "aa aa aa bb extraordinarily")], "doc_id long, text string")
    row = Q.repetition_signals(df).collect()[0]
    # chars: 2+2+2+2+15 = 23; most frequent word 'aa' (3x, 2 chars)
    assert row["top_unigram_frac"] == pytest.approx(6 / 23)
