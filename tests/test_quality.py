"""Training-corpus quality operators (operators/quality.py): Gopher
repetition signals, PII scrubbing, source-mixture weights — numpy/
hand-computed ground truths."""

import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.operators import quality as Q


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a a a a", "s1"),                    # pure repetition
        (1, "the cat sat on the mat", "s1"),
        (2, "go go go stop go go", "s2"),
        (3, "", "s2"),
        (4, "one two three four five six", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repetition_signals_hand_values(docs):
    out = {r["doc_id"]: r for r in Q.repetition_signals(docs).collect()}
    # doc 0: 4 tokens 'a' -> distinct 1/4; top unigram 4*1/4 chars = 1.0;
    # bigrams 'a a' x3 -> 3*2/4 = 1.5 (can exceed 1 for degenerate docs)
    assert out[0]["distinct_ratio"] == pytest.approx(0.25)
    assert out[0]["top_unigram_frac"] == pytest.approx(1.0)
    assert out[0]["top_bigram_frac"] == pytest.approx(1.5)
    # doc 1: 6 tokens, 17 word chars, 'the' x2 -> 2*3/17
    assert out[1]["n_tokens"] == 6
    assert out[1]["distinct_ratio"] == pytest.approx(5 / 6)
    assert out[1]["top_unigram_frac"] == pytest.approx(6 / 17)
    # doc 3: empty -> all zeros
    assert out[3]["n_tokens"] == 0
    assert out[3]["distinct_ratio"] == 0.0
    assert out[3]["top_bigram_frac"] == 0.0
    # doc 4: all distinct -> ratio 1, low repetition
    assert out[4]["distinct_ratio"] == pytest.approx(1.0)


def test_scrub_pii_redacts_and_counts(spark):
    rows = [
        (0, "mail me at a.b+c@ex-ample.org or 123456789012 now"),
        (1, "see https://x.io/p?q=1 and http://y.z/a"),
        (2, "clean text 12345678 short digits stay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in Q.scrub_pii(df).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_digit_runs"] == 1
    assert "<EMAIL>" in out[0]["scrubbed_text"]
    assert "<NUM>" in out[0]["scrubbed_text"]
    assert "a.b+c@" not in out[0]["scrubbed_text"]
    assert out[1]["n_urls"] == 2
    assert out[1]["scrubbed_text"].count("<URL>") == 2
    # 8-digit run is below the >=9 threshold: untouched
    assert out[2]["n_digit_runs"] == 0
    assert "12345678" in out[2]["scrubbed_text"]


def test_source_mixture_weights_alpha(docs):
    out = {r["source"]: r for r in
           Q.source_mixture_weights(docs, alpha=0.5).collect()}
    # s1: 4+6=10 tokens; s2: 6+0+6=12 tokens
    assert out["s1"]["n_tokens"] == 10 and out["s2"]["n_tokens"] == 12
    w1, w2 = out["s1"]["weight"], out["s2"]["weight"]
    assert w1 + w2 == pytest.approx(1.0)
    # alpha<1 compresses the gap: weight ratio = (10/12)^0.5, not 10/12
    assert w1 / w2 == pytest.approx((10 / 12) ** 0.5)
    # alpha=1 recovers proportional sampling
    out1 = {r["source"]: r["weight"] for r in
            Q.source_mixture_weights(docs, alpha=1.0).collect()}
    assert out1["s1"] == pytest.approx(10 / 22)


def test_dedup_keeplist_composition(spark):
    """Exact dups and near-dups each keep min(id); unique docs pass."""
    from pyarrowspace_spark.operators.dedup import dedup_keeplist

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),      # exact dup of 0
        (2, "alpha beta gamma delta epsilon eta theta"), # near-dup of 0
        (3, "totally different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in
           dedup_keeplist(df, n=3, threshold=0.2).collect()}
    assert out[0] is True          # survivor of both groups
    assert out[1] is False         # exact dup
    assert out[2] is False         # near-dup component member
    assert out[3] is True          # unique


def test_stratified_sample_exact_and_deterministic(spark):
    import hashlib
    import math

    rows = [(i, f"doc {i}", f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    frac = {"s0": 0.3, "s1": 1.0}  # s2 unlisted -> dropped
    out = Q.stratified_sample(df, frac, seed=11).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # exact per-stratum quota: ceil(frac * n), n = 20 per stratum
    assert len(by_src["s0"]) == math.ceil(0.3 * 20) == 6
    assert by_src["s1"] == {i for i in range(60) if i % 3 == 1}
    assert "s2" not in by_src
    # membership matches the spec'd md5 rank computed independently
    s0_ids = sorted((hashlib.md5(f"11|{i}".encode()).hexdigest(), i)
                    for i in range(60) if i % 3 == 0)
    assert by_src["s0"] == {i for _, i in s0_ids[:6]}
    # stable under repartitioning (membership is hash-of-id, not order)
    out2 = Q.stratified_sample(df.repartition(7), frac, seed=11).collect()
    assert {(r["source"], r["doc_id"]) for r in out2} == {
        (r["source"], r["doc_id"]) for r in out}
    # different seed -> (almost surely) different s0 subset, same quota
    out3 = Q.stratified_sample(df, frac, seed=12).collect()
    s0_alt = {r["doc_id"] for r in out3 if r["source"] == "s0"}
    assert len(s0_alt) == 6


def test_mixture_sample_budget_and_boundary(spark):
    import hashlib

    # s0: 4 docs x 10 tokens; s1: 2 docs x 5 tokens (small source)
    rows = [(i, " ".join(["w"] * 10), "s0") for i in range(4)]
    rows += [(10 + i, " ".join(["w"] * 5), "s1") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # alpha=1: weights proportional to tokens -> w_s0 = 40/50, w_s1 = 10/50
    # T=25 -> budgets: s0 = ceil(20) = 20 tokens, s1 = ceil(5) = 5
    out = Q.mixture_sample(df, 25, alpha=1.0, seed=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # s0: docs taken in md5 order while cum-before < 20 -> docs 1,2
    # (10+10 = 20 exactly; the third doc would start AT the budget and
    # is excluded: 20 - 10 < 20 holds for doc 2, 30 - 10 >= 20 for 3)
    assert len(by_src["s0"]) == 2
    md5_order = sorted(range(4),
                       key=lambda i: (hashlib.md5(f"5|{i}".encode())
                                      .hexdigest(), i))
    assert set(by_src["s0"]) == set(md5_order[:2])
    # s1 budget 5 tokens -> exactly one 5-token doc
    assert len(by_src["s1"]) == 1
    # boundary-doc inclusion: budget 12 for s0 (T=15, alpha=1 ->
    # s0 budget ceil(12)=12): doc 1 fills 10, doc 2 STARTS under
    # budget (10 < 12) so it is included though it crosses to 20
    out2 = Q.mixture_sample(df, 15, alpha=1.0, seed=5).collect()
    s0_ids = [r["doc_id"] for r in out2 if r["source"] == "s0"]
    assert len(s0_ids) == 2
    # undershoot: a source smaller than its budget contributes all
    # docs and nothing errors (T huge)
    out3 = Q.mixture_sample(df, 10_000, alpha=1.0, seed=5).collect()
    assert len(out3) == 6
