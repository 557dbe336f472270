"""Dimensionality reduction + intrinsic-dimension estimation.

Reference surface:
- `with_dims_reduction(true, Some(eps))` enables a crate-internal
  reduction before graph build (reference src/lib.rs:283,358-359); the
  exact method is not published (SURVEY §2.11 spec gap G9), so we pin a
  seedless, engine-portable method: a **Rademacher (±1) random
  projection** (Achlioptas 2001, JL-family) whose sign matrix is
  derived from md5 — identical on any machine, no RNG state to ship.
- auto-K clustering uses a **two-NN intrinsic-dimension estimate**
  ("Estimated intrinsic dim via 2-NN ratios", reference log
  tests/output/1760705545_v0_16/suggested_eps.md:7-12, SURVEY §2 G8);
  we implement the TwoNN MLE (Facco et al. 2017): μ_i = r2_i/r1_i,
  d = n / Σ ln μ_i.

Scale notes: the projection is a narrow per-row JVM expression over a
broadcast literal sign matrix (no shuffle, no Python). The two-NN pass
is the only quadratic piece — at bench scale feed it `df.sample(...)`
(the estimator is statistically stable on samples) or ANN candidates.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rademacher_signs(n_features: int, k: int, tag: str = "rp") -> np.ndarray:
    """Deterministic F×K ±1 sign matrix: sign_ij = parity of the first
    byte of md5(f"{tag}_{i}_{j}"). Portable across engines/machines —
    the DuckDB oracle embeds the same literals."""
    out = np.empty((n_features, k), dtype=np.int64)
    for i in range(n_features):
        for j in range(k):
            b = hashlib.md5(f"{tag}_{i}_{j}".encode()).digest()[0]
            out[i, j] = 1 if b & 1 else -1
    return out


def random_project(
    df: DataFrame,
    k: int,
    n_features: int,
    feat_col: str = "features",
    out_col: str = "proj",
    tag: str = "rp",
) -> DataFrame:
    """Project array<double> features to k dims: proj_j = (x·r_j)/√k.

    Pure JVM column expressions over literal sign vectors — narrow (no
    shuffle, no UDF), whole-stage-codegen friendly, and identical on a
    1000-executor cluster because the "matrix" is a plan literal.
    """
    signs = rademacher_signs(n_features, k, tag)
    inv = 1.0 / math.sqrt(k)
    dims = []
    for j in range(k):
        sv = F.array(*[F.lit(float(s)) for s in signs[:, j]])
        dims.append(
            F.aggregate(
                F.zip_with(F.col(feat_col), sv, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(inv)
        )
    return df.withColumn(out_col, F.array(*dims))


def two_nn_distances(
    items: DataFrame,
    id_col: str = "item_id",
    feat_col: str = "features",
    max_rows: int = 4000,
) -> DataFrame:
    """Per-item (d1, d2): euclidean distance to the nearest and
    second-nearest other item, ties broken by neighbor id.

    Broadcast-corpus BLAS scan, same pattern as the exact kNN path:
    each partition gemms its rows against the corpus matrix and emits
    exactly one (d1, d2) row per item — the N² pair space never
    materializes and nothing shuffles. (A per-pair SQL `aggregate`
    lambda costs ~100× a gemm — it was the 2nd-slowest bench query.)

    Corpora above `max_rows` run on a deterministic hash-capped subset
    (both the broadcast matrix AND the scanned rows — TwoNN is a
    statistical estimator, stable on thousands of points; Facco et al.
    2017 §2), so the driver collect is bounded at any corpus size. The
    collect itself takes the Arrow columnar path (functions/matrix),
    ~30× faster than Row collection for wide arrays.
    """
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from ..functions.matrix import collect_id_matrix
    from .simsearch import deterministic_cap

    spark = items.sparkSession
    items = deterministic_cap(
        items.select(id_col, feat_col), id_col, int(max_rows))
    ids, X = collect_id_matrix(items, id_col, feat_col)
    b_ids = spark.sparkContext.broadcast(ids)
    b_X = spark.sparkContext.broadcast(X)
    b_sq = spark.sparkContext.broadcast((X * X).sum(axis=1))

    schema = StructType([
        StructField("i", LongType(), False),
        StructField("d1", DoubleType(), True),
        StructField("d2", DoubleType(), True),
    ])

    def scan(batches):
        ids_all, X_all, sq_all = b_ids.value, b_X.value, b_sq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf[feat_col].to_numpy()).astype(np.float64)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            qsq = (Q * Q).sum(axis=1)
            d2m = np.maximum(
                qsq[:, None] + sq_all[None, :] - 2.0 * (Q @ X_all.T), 0.0)
            d = np.sqrt(d2m)
            out_i, out_1, out_2 = [], [], []
            for r in range(d.shape[0]):
                drow = d[r]
                mask = ids_all != qids[r]
                cand = np.nonzero(mask)[0]
                # two smallest by (dist, neighbor id)
                sel = cand[np.lexsort((ids_all[cand], drow[cand]))[:2]]
                out_i.append(qids[r])
                out_1.append(drow[sel[0]] if sel.size > 0 else None)
                out_2.append(drow[sel[1]] if sel.size > 1 else None)
            yield pd.DataFrame({"i": out_i, "d1": out_1, "d2": out_2})

    return items.select(id_col, feat_col).mapInPandas(scan, schema=schema)


def two_nn_intrinsic_dim(
    items: DataFrame,
    id_col: str = "item_id",
    feat_col: str = "features",
    max_rows: int = 4000,
) -> DataFrame:
    """TwoNN MLE intrinsic dimension: one row
    [n_used, id_mle] with d = n / Σ ln(d2/d1) over items with d1 > 0.
    Bounded by `max_rows` (see two_nn_distances)."""
    two = two_nn_distances(items, id_col, feat_col, max_rows=max_rows)
    mu = two.filter(F.col("d1") > 0).select(
        (F.col("d2") / F.col("d1")).alias("mu")
    )
    return mu.agg(
        F.count("*").cast("long").alias("n_used"),
        (F.count("*") / F.sum(F.log("mu"))).alias("id_mle"),
    )


def suggest_graph_params(
    items: DataFrame,
    id_col: str = "item_id",
    feat_col: str = "features",
    max_rows: int = 4000,
) -> DataFrame:
    """Dimension-aware graph-parameter suggestions — the reference's
    "Auto-computing optimal clustering parameters" surface (log
    tests/output/1760705545_v0_16/suggested_eps.md:7-12 prints exactly
    these quantities for N=313,841: ε≈0.0175, σ≈0.132, s≈29.2, k≈25).

    Public theory (random-geometric-graph connectivity thresholds,
    cited in the reference log itself):

      L        = ln(n)
      eps(n)   = (L/n)^(2/(d+2))     σ(n) = (L/n)^(1/(d+2))
      s(n)     = (n/L)^(1/d)         k    = round(2·L)

    with d = max(1, round(TwoNN id_mle)). The crate applies an extra
    unpublished "calibration with practical scaling" on top of the
    theory numbers (0.0175 → 1.31 in the log); we report the theory
    values the log prints and leave the calibration as a documented
    spec gap. One row:
    [n, id_mle, d_used, eps_theory, sigma_theory, s_n, k_rec].
    """
    two = two_nn_intrinsic_dim(items, id_col, feat_col, max_rows=max_rows)
    n_total = items.count()
    n, ln_n = float(n_total), math.log(max(n_total, 2))
    d_col = F.greatest(F.lit(1.0), F.round(F.col("id_mle"), 0))
    ratio = F.lit(ln_n / n)
    return two.select(
        F.lit(n_total).cast("long").alias("n"),
        "id_mle",
        d_col.cast("long").alias("d_used"),
        F.pow(ratio, F.lit(2.0) / (d_col + F.lit(2.0))).alias("eps_theory"),
        F.pow(ratio, F.lit(1.0) / (d_col + F.lit(2.0))).alias("sigma_theory"),
        F.pow(F.lit(n / ln_n), F.lit(1.0) / d_col).alias("s_n"),
        F.round(F.lit(2.0 * ln_n), 0).cast("long").alias("k_rec"),
    )


def auto_k_estimate(n_items: int, id_mle: float) -> int:
    """Auto-K for centroid clustering (reference G8 'Auto-selecting K
    via search over range'; exact crate rule unpublished — pinned
    heuristic, documented + fixture-tested): K = ⌈√(N·d)⌉ clamped to
    [2, N//2]. Grows with both corpus size and intrinsic dimension."""
    k = int(math.ceil(math.sqrt(max(n_items, 1) * max(id_mle, 1.0))))
    return max(2, min(k, max(2, n_items // 2)))


def auto_graph_params(
    items: DataFrame,
    id_col: str = "item_id",
    feat_col: str = "features",
    max_rows: int = 2048,
    eps_quantile: float = 0.9,
    margin: float = 1.10,
    n_rows: int | None = None,
    with_diagnostics: bool = False,
):
    """Self-tuning graph parameters for `ArrowSpaceBuilder.build(...,
    graph_params='auto')` — the reference's in-build "Auto-computing
    optimal clustering parameters" stage (log
    tests/output/1760705545_v0_16/suggested_eps.md:7-12), which runs
    auto-K + eps suggestion and then an unpublished "calibration with
    practical scaling" (0.0175 theory → 1.31 applied in that log).

    Our pinned calibration (the crate's is a spec gap, SURVEY §2.11) is
    measurement, not scaling magic: k comes from the connectivity rule
    k = round(2·ln n) (`suggest_graph_params`), and eps is calibrated
    to the ENGINE'S OWN distance — the rectified-cosine k-th-neighbor
    distance distribution of a deterministic ≤`max_rows` sample, taken
    at `eps_quantile` with a `margin` headroom, clamped to (0, 1].
    Sample-vs-sample neighbors are farther than corpus neighbors, so
    the estimate is biased LOOSE — safe: eps is only the sparsity cut,
    the per-node top-k cap still bounds degree. σ keeps the binding's
    eps·0.5 default. Driver cost is one max_rows² gemm (~32 MB at the
    2048 default), independent of N.
    """
    from ..functions.matrix import collect_id_matrix
    from ..params import GraphParams
    from .simsearch import deterministic_cap

    sugg = suggest_graph_params(items, id_col, feat_col,
                                max_rows=max_rows).first()
    k = max(2, int(sugg["k_rec"]))
    sample = deterministic_cap(items.select(id_col, feat_col), id_col,
                               max_rows, n_rows=n_rows)
    _, X = collect_id_matrix(sample, id_col, feat_col)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    U = X / np.where(norms > 0, norms, 1.0)
    D = 1.0 - np.maximum(U @ U.T, 0.0)   # rectified cosine distance
    np.fill_diagonal(D, np.inf)
    kk = min(k, D.shape[0] - 1)
    if kk < 1:
        raise ValueError("auto graph params need at least 2 items")
    dk = np.partition(D, kk - 1, axis=1)[:, kk - 1]
    dk = dk[np.isfinite(dk)]
    eps_raw = float(np.quantile(dk, float(eps_quantile)))
    eps = float(min(1.0, max(eps_raw * float(margin), 1e-6)))
    params = GraphParams(eps=eps, k=k, topk=k, p=2.0)
    if with_diagnostics:
        # eps_raw (the pre-margin, pre-clamp quantile) lets a gate
        # check the calibration math even when the clamp saturates eps
        n = int(sugg["n"])
        return params, {"n": n, "k": k, "kk": kk, "eps_raw": eps_raw}
    return params
