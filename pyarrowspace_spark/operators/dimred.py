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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


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
) -> DataFrame:
    """Per-item (d1, d2): euclidean distance to the nearest and
    second-nearest other item, ties broken by neighbor id.

    Exact pairwise (O(N²) shuffle-free broadcast at test scale); at
    100 TB run it on a sample — TwoNN needs only thousands of points.
    """
    a = items.select(F.col(id_col).alias("i"), F.col(feat_col).alias("fa"))
    b = items.select(F.col(id_col).alias("j"), F.col(feat_col).alias("fb"))
    pairs = a.join(b, F.col("i") != F.col("j")).select(
        "i", "j", V.euclidean_distance("fa", "fb").alias("d")
    )
    w = Window.partitionBy("i").orderBy(F.col("d").asc(), F.col("j").asc())
    two = pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    return two.groupBy("i").agg(
        F.max(F.when(F.col("rn") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("rn") == 2, F.col("d"))).alias("d2"),
    )


def two_nn_intrinsic_dim(
    items: DataFrame,
    id_col: str = "item_id",
    feat_col: str = "features",
) -> DataFrame:
    """TwoNN MLE intrinsic dimension: one row
    [n_used, id_mle] with d = n / Σ ln(d2/d1) over items with d1 > 0."""
    two = two_nn_distances(items, id_col, feat_col)
    mu = two.filter(F.col("d1") > 0).select(
        (F.col("d2") / F.col("d1")).alias("mu")
    )
    return mu.agg(
        F.count("*").cast("long").alias("n_used"),
        (F.count("*") / F.sum(F.log("mu"))).alias("id_mle"),
    )


def auto_k_estimate(n_items: int, id_mle: float) -> int:
    """Auto-K for centroid clustering (reference G8 'Auto-selecting K
    via search over range'; exact crate rule unpublished — pinned
    heuristic, documented + fixture-tested): K = ⌈√(N·d)⌉ clamped to
    [2, N//2]. Grows with both corpus size and intrinsic dimension."""
    k = int(math.ceil(math.sqrt(max(n_items, 1) * max(id_mle, 1.0))))
    return max(2, min(k, max(2, n_items // 2)))
