"""λ-aware top-k search (reference ArrowSpace.search, src/lib.rs:132-174).

score(q, x) = τ·cos(q,x) + (1-τ)·1/(1+|λ_q - λ_x|)   (TAUMODE.md:33)

Both λ_q and λ_x are synthesized with the *search-time* τ as bounding
scale and mixing weight ("τ supplied externally … reused both as the
bounding scale and as the mixing weight", TAUMODE.md) — pinned by the
reference golden τ=0.9 ranking (tests/test_0.py:35-42).

Physical plan: the query batch is tiny → broadcast join against the
corpus; scoring is a JVM column expression; top-k is a per-query
ranking window (or TakeOrderedAndProject for a single query). One
shuffle per query batch, on query_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V
from .lambda_index import lambda_for_vectors, with_lambda


def search(
    index: DataFrame,
    lf: np.ndarray,
    queries: DataFrame | np.ndarray,
    tau: float,
    k: int,
    id_col: str = "item_id",
    feat_col: str = "features",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k λ-aware search.

    `index` must carry (id_col, feat_col); item λ is recomputed at the
    search τ (narrow pass). Queries may be a DataFrame[query_id,
    features] or a local ndarray (promoted to a broadcast DataFrame —
    the reference promotes single vectors to ArrowItem, src/lib.rs:168).

    Returns DataFrame[query_id, item_id, score, rank], rank 1-based,
    exactly k rows per query (fewer only if corpus < k).
    """
    spark = index.sparkSession
    if isinstance(queries, np.ndarray):
        q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        if q.shape[1] != lf.shape[0]:
            # Reference validates query length == nfeatures (src/lib.rs:140-146).
            raise ValueError(
                f"query has {q.shape[1]} features, index has {lf.shape[0]}"
            )
        lam_q = lambda_for_vectors(q, lf, tau)
        qdf = spark.createDataFrame(
            [(int(i), [float(v) for v in row], float(l))
             for i, (row, l) in enumerate(zip(q, lam_q))],
            schema=f"{query_id_col} long, q_features array<double>, q_lambda double",
        )
    else:
        qdf = with_lambda(queries, lf, tau, feat_col=feat_col, out_col="q_lambda")
        qdf = qdf.select(
            F.col(query_id_col), F.col(feat_col).alias("q_features"), "q_lambda"
        )

    if "e_raw" in index.columns and "g" in index.columns:
        # Index built by ArrowSpaceBuilder carries the τ-independent
        # components: item λ at the search τ is a pure JVM expression —
        # no Python pass over the corpus per search call.
        from .lambda_index import blend_lambda_cols

        items = index.withColumn(
            "x_lambda", blend_lambda_cols(F.col("e_raw"), F.col("g"), tau))
    else:
        items = with_lambda(index, lf, tau, feat_col=feat_col,
                            out_col="x_lambda")

    scored = items.join(F.broadcast(qdf)).select(
        query_id_col,
        id_col,
        V.blended_score(
            V.cosine_similarity("q_features", feat_col),
            F.col("q_lambda"),
            F.col("x_lambda"),
            tau,
        ).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )


def search_hybrid(
    index: DataFrame,
    lf: np.ndarray,
    queries: DataFrame | np.ndarray,
    tau: float,
    k: int,
    **kwargs,
) -> DataFrame:
    """Reference `search_hybrid` (src/lib.rs:182-219) — same inputs and
    blend family as `search`; the crate-internal variant formula is not
    published (SURVEY §2.11 spec gap) AND no reference test or output
    log ever calls search_hybrid (grep over tests/: zero call sites —
    the harness "Hybrid (τ=0.8)" blocks all use plain `search`, e.g.
    tests/test_2_CVE_db.py:585-587), so there is no observable behavior
    to match. We pin hybrid == lambda-aware and keep the entry point
    for API parity."""
    return search(index, lf, queries, tau, k, **kwargs)


def search_ann(
    index: DataFrame,
    lf: np.ndarray,
    queries: DataFrame,
    tau: float,
    k: int,
    planes: np.ndarray,
    probe_hamming1: bool = True,
    id_col: str = "item_id",
    feat_col: str = "features",
    query_id_col: str = "query_id",
) -> DataFrame:
    """λ-aware top-k search with SUBLINEAR candidate generation: the
    same blended score as `search`, rescored only over sign-LSH bucket
    candidates (Hamming-1 multi-probe on the query side by default)
    instead of a full corpus scan.

    This is the 100 TB search path: the reference's own search is a
    full scan (acceptable interactively at its N), but at three orders
    more corpus the scan IS the query cost — bucket candidates bound it
    at O(bucket · tables) per query. Recall inherits the ANN operator's
    contract; `search` remains the exact path. `index` must carry the
    build's (e_raw, g) columns, so item λ at the caller's τ is a JVM
    expression over the candidate rows only.
    """
    import pandas as pd

    from .lambda_index import _lambda_kernel
    from .simsearch import planes_fingerprint, with_lsh_buckets

    n_tables, n_planes = planes.shape[0], planes.shape[1]
    spark = index.sparkSession

    # Hash-once contract: if the caller pre-bucketed the corpus (one
    # `with_lsh_buckets` pass persisted at index time), reuse it — a
    # search call then touches only the bucket join + candidate
    # rescore, NOT a corpus-wide pass. Per-call hashing remains the
    # fallback for ad-hoc frames. Reuse is VALIDATED: the frame must
    # carry exactly n_tables bucket columns, and when the bucketing
    # pass stamped a planes fingerprint (schema metadata — free to
    # read, survives parquet), it must match the caller's planes: a
    # bucket join under mismatched planes silently returns near-empty
    # wrong candidates instead of erroring.
    if "bucket_0" in index.columns:
        have = sorted(c for c in index.columns if c.startswith("bucket_"))
        want = sorted(f"bucket_{t}" for t in range(n_tables))
        if have != want:
            raise ValueError(
                f"index carries pre-hashed columns {have} but planes "
                f"define {len(want)} tables ({want}); re-bucket the "
                f"index with these planes or drop the bucket_* columns")
        meta = index.schema["bucket_0"].metadata or {}
        stamped = meta.get("planes_fp")
        if stamped is not None and int(stamped) != planes_fingerprint(planes):
            raise ValueError(
                "index bucket_* columns were hashed with a DIFFERENT "
                "hyperplane set than the one passed to search_ann "
                "(planes fingerprint mismatch); re-bucket the index "
                "with these planes or pass the original planes")
        hashed = index.select(id_col, feat_col, "e_raw", "g",
                              *[f"bucket_{t}" for t in range(n_tables)])
    else:
        hashed = with_lsh_buckets(
            index.select(id_col, feat_col, "e_raw", "g"), planes, feat_col)

    # Query side DRIVER-SIDE (guide §1.2 / r14): queries are
    # interactive-scale (the serving contract — never N-sized), so the
    # λ pass, the bucket hash, and the Hamming-1 probe enumeration are
    # a few numpy ops on the driver instead of three Python-worker
    # jobs + a posexplode/explode subtree under the broadcast. The
    # arithmetic is the exact op sequence the distributed twins apply:
    # `_lambda_kernel` IS with_lambda's kernel, and the bucket gemm is
    # `with_lsh_buckets`' float64 X @ H.T > 0 fold.
    qrows = queries.select(query_id_col, feat_col).collect()
    out_schema = (f"{query_id_col} long, {id_col} long, "
                  "score double")
    if not qrows:
        empty = spark.createDataFrame([], out_schema + ", rank int")
        return empty
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    _, _, q_lam = _lambda_kernel(Q, lf, float(tau))
    q_norm = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    H = planes.reshape(n_tables * n_planes, planes.shape[-1])
    signs = (Q @ H.T) > 0
    pow2 = (2 ** np.arange(n_planes)).astype(np.int64)
    q_buckets = (signs.reshape(len(qids), n_tables, n_planes)
                 * pow2).sum(axis=2)
    probe_rows = []
    for qi in range(len(qids)):
        for t in range(n_tables):
            b = int(q_buckets[qi, t])
            probes = [b] + ([b ^ (1 << j) for j in range(n_planes)]
                            if probe_hamming1 else [])
            probe_rows.extend(
                (int(t), p, int(qids[qi])) for p in probes)
    probe_df = spark.createDataFrame(
        probe_rows, f"t int, bucket long, {query_id_col} long")

    # Candidate generation: ONE corpus pass — posexplode the bucket
    # columns and probe the broadcast (t, bucket, query) table. No
    # per-row HOF anywhere on the corpus side.
    it = hashed.select(
        id_col, feat_col, "e_raw", "g",
        F.posexplode(F.array(*[f"bucket_{t}" for t in range(n_tables)]))
        .alias("t", "bucket"),
    )
    cands = it.join(F.broadcast(probe_df), ["t", "bucket"]).select(
        query_id_col, id_col, feat_col, "e_raw", "g")

    # Rescore in ONE vectorized Arrow kernel (guide §4.2): the r13
    # expression scoring was measured at ~5 ms/candidate-row — the
    # interpreted zip_with+aggregate dot fold, ~1,430 CPU-seconds for
    # 50 queries at the 78k bench corpus (the r13 verdict's 32-core
    # "ANN serving blowup" was exactly this stage saturating all
    # cores). The same math as whole-batch numpy is ~100× cheaper;
    # summation order changes (pairwise vs sequential fold, ~1e-13 on
    # unit-scale scores), absorbed by the 5-6 decimal rounding every
    # declared query applies — re-verified against the DuckDB oracle.
    bq = spark.sparkContext.broadcast(
        {"qids": qids, "Q": Q, "lam": q_lam, "qn": q_norm})
    t_f = float(tau)

    def _score_batches(batches):
        qv = bq.value
        order = np.argsort(qv["qids"], kind="stable")
        sq = qv["qids"][order]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[feat_col].to_numpy()).astype(np.float64)
            qpos = order[np.searchsorted(sq, pdf[query_id_col]
                                         .to_numpy(np.int64))]
            Qs = qv["Q"][qpos]
            dots = np.einsum("ij,ij->i", Qs, X)
            xn = np.sqrt(np.einsum("ij,ij->i", X, X))
            cos = dots / (qv["qn"][qpos] * xn)
            e = pdf["e_raw"].to_numpy(np.float64)
            g = pdf["g"].to_numpy(np.float64)
            xl = t_f * (e / (e + t_f)) + (1.0 - t_f) * g
            score = (t_f * cos
                     + (1.0 - t_f)
                     / (1.0 + np.abs(qv["lam"][qpos] - xl)))
            yield pd.DataFrame({
                query_id_col: pdf[query_id_col].to_numpy(np.int64),
                id_col: pdf[id_col].to_numpy(np.int64),
                "score": score,
            })

    # Dedupe duplicate (query, item) probe hits AFTER scoring — the
    # duplicates carry identical inputs → identical doubles, so
    # max == the value and the agg shuffles 24-byte rows map-side
    # (guide §2.3); measured duplicate factor at the bench corpus is
    # only 1.09×, so scoring-before-dedupe costs ~9% extra kernel work
    # and saves a full-width pre-shuffle.
    scored = cands.mapInPandas(_score_batches, out_schema).groupBy(
        query_id_col, id_col).agg(F.max("score").alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )


def brute_force_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "item_id",
    feat_col: str = "features",
    query_id_col: str = "query_id",
    query_feat_col: str = "features",
) -> DataFrame:
    """Exact cosine top-k — the harness baseline (reference
    tests/test_3_beir.py:280-286 `np.argsort(-sims)[:k]`).

    Broadcast the query side; corpus scan stays partition-parallel.
    """
    qdf = queries.select(
        F.col(query_id_col), F.col(query_feat_col).alias("q_features")
    )
    scored = items.join(F.broadcast(qdf)).select(
        query_id_col,
        id_col,
        V.cosine_similarity("q_features", feat_col).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )
