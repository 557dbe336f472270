"""S10 embedding source (sources/embed.py): deterministic feature
hashing as a batched pandas_udf, end-to-end into build+search — the
reference harness chain encode → build → search
(reference tests/test_2_CVE_db.py:146-175)."""

import numpy as np
import pytest

from pyarrowspace_spark.builder import ArrowSpaceBuilder
from pyarrowspace_spark.operators.search import search
from pyarrowspace_spark.sources import embed as EMB

DOCS = [
    (0, "path traversal lets an attacker read arbitrary files"),
    (1, "remote attacker can read arbitrary files via path traversal"),
    (2, "sql injection in the login form allows database access"),
    (3, "cross site scripting in the comment field"),
    (4, "buffer overflow in the image parser causes code execution"),
    (5, "attacker reads arbitrary files through directory traversal"),
    (6, ""),
    (7, None),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string")


def test_embed_matches_local_and_is_deterministic(spark, docs_df):
    out = EMB.embed_text(docs_df).orderBy("doc_id").collect()
    assert len(out) == 8
    local = EMB.embed_texts_local([t or "" for _, t in DOCS])
    for row, expect in zip(out, local):
        assert np.asarray(row["embedding"]) == pytest.approx(expect, abs=1e-12)
    # scale contract: x12 magnitude for non-empty docs, zeros for empty
    norms = [float(np.linalg.norm(r["embedding"])) for r in out]
    assert norms[:6] == pytest.approx([12.0] * 6)
    assert norms[6] == norms[7] == 0.0


def test_embed_similarity_structure(docs_df):
    """Near-duplicate texts (0,1,5) must be mutually closer than
    unrelated ones — the property every downstream operator relies on."""
    emb = EMB.embed_texts_local([t or "" for _, t in DOCS[:6]])
    cos = emb @ emb.T / (np.linalg.norm(emb, axis=1)[:, None]
                         * np.linalg.norm(emb, axis=1)[None, :])
    dup_pairs = [cos[0, 1], cos[0, 5], cos[1, 5]]
    cross = [cos[0, 2], cos[0, 3], cos[1, 4], cos[2, 3]]
    assert min(dup_pairs) > max(cross)


def test_embed_feeds_build_and_search(spark, docs_df):
    """Full S10 chain: text → embed → build → search retrieves the
    near-dup cluster for a traversal query."""
    items = EMB.embed_text(docs_df.filter("text IS NOT NULL AND text <> ''"))
    items = items.selectExpr("doc_id AS item_id", "embedding AS features")
    idx = ArrowSpaceBuilder.build(
        items, {"eps": 0.95, "k": 5, "topk": 3, "p": 2.0}, strategy="exact")
    q = EMB.embed_texts_local(["attacker path traversal arbitrary files"])[0]
    hits = search(idx.items, idx.feature_laplacian, q, tau=0.8, k=3)
    got = {r["item_id"] for r in hits.collect()}
    assert got <= {0, 1, 5}
