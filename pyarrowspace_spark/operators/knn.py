"""kNN similarity self-join — the core of the λτ-graph build.

Reference semantics (GRAPH_VARIABLES.md:7-10): for each item, keep
candidate neighbors with rectified-cosine distance d <= eps, cap at the
k smallest per node, symmetrize, then weight w = 1/(1+(d/sigma)^p).

Two physical strategies, one logical contract:

- ``exact``: blocked cross-join + per-node top-k window. O(N^2) —
  correct at any N but only *sized* for N up to ~10^5. This is the
  correctness path used by tests and the DuckDB oracle.
- ``lsh``: BucketedRandomProjectionLSH on unit-normalized vectors.
  On the unit sphere, ||a-b||^2 = 2 - 2·cos(a,b), so the cosine
  eps-ball maps exactly to a Euclidean ball of radius sqrt(2·eps);
  the LSH join prunes candidate pairs before the same exact rescore.
  This is the 100 TB path: candidate generation is bucket-local
  (shuffle on bucket hash), never all-pairs.

``strategy='auto'`` switches on a row-count threshold.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..params import GraphParams
from ..functions import vector as V

# Above this many items the exact all-pairs join is no longer the plan
# you'd want on a cluster; switch to LSH candidate generation.
EXACT_PATH_MAX_ROWS = 20_000


def _pairwise_candidates_exact(items: DataFrame, id_col: str, feat_col: str) -> DataFrame:
    """All ordered pairs (a != b) with rectified-cosine distance.

    The join condition a.id != b.id keeps Catalyst from collapsing the
    self-join; distances are computed with JVM higher-order functions
    inside codegen. Norms are precomputed once per side to halve work.

    Kept as the pure-SQL reference formulation; the default exact path
    is `_knn_edges_broadcast_scan` (same math, vectorized) because a
    per-pair `aggregate` lambda costs ~100x a BLAS matmul.
    """
    a = items.select(
        F.col(id_col).alias("src"),
        F.col(feat_col).alias("_fa"),
        V.l2_norm(feat_col).alias("_na"),
    )
    b = items.select(
        F.col(id_col).alias("dst"),
        F.col(feat_col).alias("_fb"),
        V.l2_norm(feat_col).alias("_nb"),
    )
    pairs = a.join(b, F.col("src") != F.col("dst"))
    cos = V.dot("_fa", "_fb") / (F.col("_na") * F.col("_nb"))
    return pairs.select(
        "src",
        "dst",
        (F.lit(1.0) - F.greatest(cos, F.lit(0.0))).alias("dist"),
    )


def _knn_directed_broadcast_scan(
    items: DataFrame,
    id_col: str,
    feat_col: str,
    eps: float,
    k: int,
) -> DataFrame:
    """Directed kNN candidates via broadcast corpus + partition-local
    numpy scan.

    Each partition multiplies its rows against the broadcast corpus
    matrix (one BLAS gemm per Arrow batch), applies the eps predicate
    and the per-row k-smallest cap (ties broken by dst asc, matching
    the SQL window `ORDER BY dist ASC, dst ASC`), and emits at most
    k rows per item — the N^2 candidate space never hits the shuffle.

    Scale contract: corpus matrix must fit in executor memory
    (N x F x 8B; ~1 GB at N=314k, F=384 — the reference's own ceiling).
    Beyond that, `strategy='lsh'` is the path.
    """
    import pandas as pd

    spark = items.sparkSession
    rows = items.select(id_col, feat_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    X = np.array([r[feat_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1)
    b_ids = spark.sparkContext.broadcast(ids)
    b_X = spark.sparkContext.broadcast(X)
    b_norms = spark.sparkContext.broadcast(norms)
    eps_f, k_i = float(eps), int(k)

    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    schema = StructType([
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("dist", DoubleType(), False),
    ])

    def scan(batches):
        ids_all, X_all, n_all = b_ids.value, b_X.value, b_norms.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf[feat_col].to_numpy()).astype(np.float64)
            qids = pdf[id_col].to_numpy(dtype=np.int64)
            qn = np.linalg.norm(Q, axis=1)
            cos = (Q @ X_all.T) / np.outer(qn, n_all)
            dist = 1.0 - np.maximum(cos, 0.0)
            out_s, out_d, out_v = [], [], []
            for r in range(dist.shape[0]):
                drow = dist[r]
                mask = (drow <= eps_f) & (ids_all != qids[r])
                cand = np.nonzero(mask)[0]
                if cand.size == 0:
                    continue
                if cand.size > k_i:
                    # k smallest by (dist, dst): lexsort minor->major
                    order = np.lexsort((ids_all[cand], drow[cand]))[:k_i]
                    cand = cand[order]
                out_s.append(np.full(cand.size, qids[r], dtype=np.int64))
                out_d.append(ids_all[cand])
                out_v.append(drow[cand])
            if out_s:
                yield pd.DataFrame({
                    "src": np.concatenate(out_s),
                    "dst": np.concatenate(out_d),
                    "dist": np.concatenate(out_v),
                })

    # Spread the gemm across cores: a single-file parquet scan arrives
    # as ONE partition, which would serialize the whole N×N scan on one
    # Python worker.
    src = items.select(id_col, feat_col)
    target = min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        max(1, len(ids) // 256),
    )
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(scan, schema=schema)


def _pairwise_candidates_lsh(
    items: DataFrame, id_col: str, feat_col: str, eps: float
) -> DataFrame:
    """LSH-pruned candidate pairs within the cosine eps-ball.

    Unit-normalizes, converts to MLlib vectors at the boundary only,
    and uses approxSimilarityJoin with threshold sqrt(2*eps).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    unit = items.select(
        F.col(id_col).alias("id"),
        array_to_vector(V.l2_normalize(feat_col)).alias("unit_vec"),
    )
    threshold = math.sqrt(max(2.0 * eps, 1e-12))
    # Join threshold is padded 15% and 6 hash tables are used: the
    # approx join only GENERATES candidates — the exact eps filter
    # downstream re-verifies every distance, so padding buys edge
    # recall (contract: >=0.95 of the exact graph, SURVEY §7.3 #2)
    # at candidate-count cost, never correctness.
    join_threshold = threshold * 1.15
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit_vec",
        outputCol="hashes",
        bucketLength=max(threshold, 1e-6),
        numHashTables=6,
        seed=42,
    )
    model = lsh.fit(unit)
    joined = model.approxSimilarityJoin(unit, unit, join_threshold,
                                        distCol="_eucl")
    # d_cos = 1 - cos = eucl^2 / 2 on the unit sphere. Rectification:
    # pairs with cos < 0 have eucl > sqrt(2) > threshold for eps <= 1,
    # so they are already pruned.
    return joined.select(
        F.col("datasetA.id").alias("src"),
        F.col("datasetB.id").alias("dst"),
        (F.col("_eucl") * F.col("_eucl") / F.lit(2.0)).alias("dist"),
    ).filter(F.col("src") != F.col("dst"))


def knn_edges(
    items: DataFrame,
    params: GraphParams,
    id_col: str = "item_id",
    feat_col: str = "features",
    strategy: str = "auto",
) -> DataFrame:
    """Build the symmetrized, weighted kNN edge list.

    Returns DataFrame[src, dst, dist, weight] with src < dst
    (canonical undirected edges, one row per edge).

    Pipeline (all reference-pinned):
      eps filter (GRAPH_VARIABLES.md:7) -> per-node k-smallest heap
      == row_number window (GRAPH_VARIABLES.md:8) -> symmetrize ->
      kernel weight (GRAPH_VARIABLES.md:9).
    """
    if strategy == "auto":
        strategy = "exact" if items.count() <= EXACT_PATH_MAX_ROWS else "lsh"
    if strategy == "exact":
        # eps + per-node top-k already applied partition-locally.
        knn = _knn_directed_broadcast_scan(
            items, id_col, feat_col, params.eps, params.k
        )
    else:
        if strategy == "exact-sql":
            cand = _pairwise_candidates_exact(items, id_col, feat_col)
        elif strategy == "lsh":
            cand = _pairwise_candidates_lsh(items, id_col, feat_col, params.eps)
        else:
            raise ValueError(f"unknown strategy {strategy!r}")

        # eps predicate BEFORE the top-k window: Catalyst pushes the
        # filter below the shuffle, so the window sorts only survivors.
        in_ball = cand.filter(F.col("dist") <= F.lit(float(params.eps)))

        # Per-node k smallest; tie-break by dst for determinism across
        # nondeterministic shuffle order (risk register SURVEY §7.3).
        w = Window.partitionBy("src").orderBy(
            F.col("dist").asc(), F.col("dst").asc()
        )
        knn = in_ball.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= F.lit(int(params.k))
        ).drop("_rn")

    # Symmetrize: undirected edge survives if EITHER direction kept it.
    # Canonicalize to src < dst and dedupe (dist is symmetric).
    canon = knn.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "dist",
    ).groupBy("src", "dst").agg(F.min("dist").alias("dist"))

    return canon.withColumn(
        "weight", V.kernel_weight("dist", params.sigma, params.p)
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node weighted degree from the canonical undirected edge list.

    This is the diagonal of L = D - W (reference GRAPH_VARIABLES.md:8,
    TAUMODE.md:26). Map-side partial aggregation makes this one cheap
    shuffle at any scale.
    """
    both = edges.select(F.col("src").alias("node"), "weight").unionAll(
        edges.select(F.col("dst").alias("node"), "weight")
    )
    return both.groupBy("node").agg(F.sum("weight").alias("degree"))


def sparsity(edges: DataFrame, n_items: int) -> float:
    """1 - nnz/N^2 over the symmetric adjacency (reference
    with_sparsity_check, src/lib.rs:286)."""
    nnz = edges.count() * 2  # canonical edges stored once
    return 1.0 - nnz / float(n_items * n_items)
