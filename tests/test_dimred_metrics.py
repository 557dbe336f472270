"""Dims-reduction / intrinsic-dim (SURVEY §2 G8-G9) and paired t-test
(M10) operator units — numpy is the ground truth."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.operators import dimred as DR
from pyarrowspace_spark.operators import metrics as MT


def test_rademacher_signs_deterministic_pm1():
    s1 = DR.rademacher_signs(24, 4)
    s2 = DR.rademacher_signs(24, 4)
    assert (s1 == s2).all()
    assert set(np.unique(s1)) <= {-1, 1}
    # different tag → different matrix
    assert (DR.rademacher_signs(24, 4, tag="other") != s1).any()


def test_random_project_matches_numpy(spark, test0_items_df):
    k = 4
    out = DR.random_project(test0_items_df, k, 24).collect()
    signs = DR.rademacher_signs(24, k).astype(np.float64)
    rows = {r["item_id"]: r["features"] for r in test0_items_df.collect()}
    for r in out:
        want = (np.array(rows[r["item_id"]]) @ signs) / math.sqrt(k)
        assert np.allclose(r["proj"], want, atol=1e-12)


def test_two_nn_intrinsic_dim_plane(spark):
    # points on a noisy 2-D plane embedded in 8-D → estimate ≈ 2
    rng = np.random.RandomState(42)
    pts = np.zeros((300, 8))
    pts[:, :2] = rng.rand(300, 2)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)],
        "item_id long, features array<double>")
    row = DR.two_nn_intrinsic_dim(df).collect()[0]
    assert row["n_used"] == 300
    assert 1.4 < row["id_mle"] < 2.8


def test_auto_k_estimate_bounds():
    assert DR.auto_k_estimate(500, 35.0) == min(
        math.ceil(math.sqrt(500 * 35.0)), 250)
    assert DR.auto_k_estimate(4, 1.0) == 2       # clamped low
    assert DR.auto_k_estimate(0, 0.0) == 2       # degenerate input


def test_paired_ttest_matches_scipy_formula(spark):
    a_vals = [0.9, 0.8, 0.95, 0.7, 0.85]
    b_vals = [0.85, 0.82, 0.90, 0.65, 0.80]
    a = spark.createDataFrame(
        [(i, v) for i, v in enumerate(a_vals)], "query_id long, value double")
    b = spark.createDataFrame(
        [(i, v) for i, v in enumerate(b_vals)], "query_id long, value double")
    row = MT.paired_ttest(a, b).collect()[0]
    d = np.array(a_vals) - np.array(b_vals)
    t_want = d.mean() / (d.std(ddof=1) / math.sqrt(len(d)))
    assert row["n"] == 5
    assert row["mean_diff"] == pytest.approx(d.mean(), abs=1e-12)
    assert row["t_stat"] == pytest.approx(t_want, abs=1e-9)


def test_lang_id_bigrams_and_predict(spark):
    from pyarrowspace_spark.functions import text as T
    df = spark.createDataFrame(
        [(0, "the then there"), (1, "zhong xiao ji"), (2, "x")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id",
        F.size(T.char_bigrams("text")).alias("nbg"),
        T.lang_score("text", "en").alias("s_en"),
        T.lang_score("text", "zh").alias("s_zh"),
        T.lang_predict("text").alias("pred"),
    ).collect()}
    assert rows[0]["nbg"] == len("the then there") - 1
    assert rows[0]["s_en"] > rows[0]["s_zh"]
    assert rows[0]["pred"] == "en"
    assert rows[1]["s_zh"] > rows[1]["s_en"]
    assert rows[1]["pred"] == "zh"
    assert rows[2]["nbg"] == 0 and rows[2]["s_en"] == 0.0


def test_lang_scores_text_equals_bigram_formulation(spark):
    """The replace-count fast path must produce byte-identical scores to
    the bigram-array formulation on real corpus text."""
    from pyarrowspace_spark.functions import text as T
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    slow = F.array(*[T.lang_score("text", g) for g in T.LANGS])
    for r in docs.select(T.lang_scores_text("text").alias("fast"),
                         slow.alias("slow")).collect():
        assert r["fast"] == r["slow"]


def test_connected_components_chain_and_isolate(spark):
    from pyarrowspace_spark.operators import dedup as D
    # chain 1-2-3-4, pair (10,11), singleton edge (20,21)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)],
        "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in
           D.connected_components(pairs, iters=4).collect()}
    assert {got[1], got[2], got[3], got[4]} == {1}
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == 20


def test_shard_by_token_budget_running_sum(spark):
    from pyarrowspace_spark.operators import dedup as D
    docs = spark.createDataFrame(
        [(i, "tok " * 50) for i in range(10)], "doc_id long, text string")
    rows = sorted(D.shard_by_token_budget(docs, 100).collect(),
                  key=lambda r: r["doc_id"])
    # 50 tokens each, budget 100 -> docs (0,1) shard 0, (2,3) shard 1, ...
    for r in rows:
        assert r["n_tokens"] == 50
        assert r["shard"] == r["doc_id"] // 2


def test_two_nn_collect_is_capped(spark):
    """Guard (VERDICT r2 'What's wrong' #1): above max_rows the TwoNN
    pass runs on a deterministic hash-capped subset — the driver
    collect is bounded and the estimate stays stable."""
    rng = np.random.default_rng(7)
    n, d = 600, 6
    rows = [(int(i), [float(v) for v in rng.normal(size=d)])
            for i in range(n)]
    df = spark.createDataFrame(rows, "item_id long, features array<double>")
    capped = DR.two_nn_intrinsic_dim(df, max_rows=200).collect()[0]
    assert capped["n_used"] <= 200
    full = DR.two_nn_intrinsic_dim(df, max_rows=10_000).collect()[0]
    assert full["n_used"] == n
    # statistical stability: sample estimate within 40% of full estimate
    assert capped["id_mle"] == pytest.approx(full["id_mle"], rel=0.4)
    # determinism across partitionings
    again = DR.two_nn_intrinsic_dim(df.repartition(13), max_rows=200
                                    ).collect()[0]
    assert again["n_used"] == capped["n_used"]
    assert again["id_mle"] == pytest.approx(capped["id_mle"], abs=1e-12)


def test_ivf_centroids_partitioning_invariant(spark):
    """Quantizer determinism (VERDICT r2 'What's wrong' #2): identical
    centroids from differently-partitioned reads of the same corpus,
    including through the hash-cap path."""
    from pyarrowspace_spark.operators.simsearch import ivf_centroids

    rng = np.random.default_rng(11)
    rows = [(int(i), [float(v) for v in rng.normal(size=4)])
            for i in range(500)]
    df1 = spark.createDataFrame(rows, "item_id long, features array<double>")
    df2 = spark.createDataFrame(rows, "item_id long, features array<double>"
                                ).repartition(17)
    c1 = ivf_centroids(df1, 8, max_train=200)
    c2 = ivf_centroids(df2, 8, max_train=200)
    assert np.array_equal(c1, c2)
    # and the no-cap path
    assert np.array_equal(ivf_centroids(df1, 8), ivf_centroids(df2, 8))


def test_suggest_graph_params_reference_log_values(spark):
    """The dimension-aware formulas must reproduce the reference
    build log's printed numbers (suggested_eps.md:7-12: N=313,841,
    d=3 -> eps~0.0175, sigma~0.132, s~29.2, k~25), and d_used must
    come from the data's TwoNN estimate."""
    # formula arithmetic at the log's N and d
    n, d = 313841, 3.0
    ln_n = math.log(n)
    assert (ln_n / n) ** (2 / (d + 2)) == pytest.approx(0.0175, abs=2e-4)
    assert (ln_n / n) ** (1 / (d + 2)) == pytest.approx(0.132, abs=2e-3)
    assert (n / ln_n) ** (1 / d) == pytest.approx(29.2, abs=0.1)
    assert round(2 * ln_n) == 25

    # end-to-end on a 3-manifold embedded in 8 dims
    rng = np.random.default_rng(3)
    base = rng.normal(size=(3, 8))
    rows = [(int(i), [float(v) for v in rng.normal(size=3) @ base])
            for i in range(400)]
    df = spark.createDataFrame(rows, "item_id long, features array<double>")
    out = DR.suggest_graph_params(df).collect()[0]
    assert out["n"] == 400
    assert 2 <= out["d_used"] <= 4
    ln400 = math.log(400)
    assert out["k_rec"] == round(2 * ln400)
    d_used = float(out["d_used"])
    assert out["eps_theory"] == pytest.approx(
        (ln400 / 400) ** (2 / (d_used + 2)), rel=1e-9)
