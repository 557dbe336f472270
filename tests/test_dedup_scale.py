"""Scale-path contracts for the dedup operators: the LSH fallback of
`embedding_near_dup_pairs` must reproduce the exact pair set (with
enough band amplification), and the partition-prefix variant of
`shard_by_token_budget` must pack correctly WITHOUT a single-ordering
global sort in the plan."""

import io
import contextlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyarrowspace_spark.operators import dedup as D
from pyarrowspace_spark.sources import loaders

SF_DIR = "/root/testdata/sf0.001"

# sf0.001 embeddings: max off-diagonal cosine ~0.479, so threshold 0.3
# catches pairs at angle 61-72.5 deg (per-bit collision p in
# [0.60, 0.66]). With 2-bit bands the per-band hit prob is >= 0.35;
# 64 bands make the per-pair miss probability <= (1-0.35)^64 ~ 1e-12,
# so exact == lsh is deterministic, not flaky.
NEARDUP_T = 0.3


@pytest.fixture(scope="module")
def emb(spark):
    return loaders.load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding")


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_embedding_neardup_lsh_matches_exact(spark, emb):
    exact = D.embedding_near_dup_pairs(emb, NEARDUP_T, strategy="exact")
    lsh = D.embedding_near_dup_pairs(
        emb, NEARDUP_T, strategy="lsh", lsh_bits=2, lsh_bands=64)
    pe, pl = _pair_set(exact), _pair_set(lsh)
    assert pe, "test corpus should contain near-dup pairs at t=0.3"
    assert pe == pl


def test_embedding_neardup_auto_is_exact_at_small_n(spark, emb):
    # below EXACT_PATH_MAX_ROWS auto must route to the exact scan
    auto = D.embedding_near_dup_pairs(emb, NEARDUP_T, strategy="auto")
    exact = D.embedding_near_dup_pairs(emb, NEARDUP_T, strategy="exact")
    assert _pair_set(auto) == _pair_set(exact)


# --- shard packing ---------------------------------------------------------

BUDGET = 4096


@pytest.fixture(scope="module")
def docs(spark):
    return loaders.load_table(spark, SF_DIR, "documents")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_shard_partition_prefix_semantics(spark, docs):
    out = D.shard_by_token_budget(
        docs, BUDGET, global_order_max_rows=0).toPandas()
    n_docs = docs.count()
    assert len(out) == n_docs
    assert out["doc_id"].nunique() == n_docs
    # within each partition prefix, the shard must follow the running
    # cumsum formula in doc_id order
    out["prefix"] = out["shard"].to_numpy() >> 32
    for prefix, grp in out.groupby("prefix"):
        g = grp.sort_values("doc_id")
        nt = g["n_tokens"].to_numpy(dtype=np.int64)
        cum = np.cumsum(nt)
        expect = (int(prefix) << 32) | ((cum - nt) // BUDGET)
        assert (g["shard"].to_numpy() == expect).all()
    # partition prefixes must cover id-contiguous ranges (range
    # partitioning): prefix ranges do not interleave
    spans = (out.groupby("prefix")["doc_id"].agg(["min", "max"])
             .sort_values("min"))
    assert (spans["max"].to_numpy()[:-1] <= spans["min"].to_numpy()[1:]).all()


def test_shard_partition_prefix_no_global_sort(spark, docs):
    scaled = D.shard_by_token_budget(docs, BUDGET, global_order_max_rows=0)
    plan = _plan(scaled)
    assert "SinglePartition" not in plan
    # the global path (test scale) legitimately keeps the total-order
    # window — sanity-check the switch actually switches
    small = D.shard_by_token_budget(docs, BUDGET)
    assert "SinglePartition" in _plan(small)


def test_shard_global_path_unchanged(spark, docs):
    out = D.shard_by_token_budget(docs, BUDGET).toPandas().sort_values(
        "doc_id")
    nt = out["n_tokens"].to_numpy(dtype=np.int64)
    cum = np.cumsum(nt)
    assert (out["shard"].to_numpy() == (cum - nt) // BUDGET).all()
