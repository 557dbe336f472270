"""Energy/diffusion pipeline (reference build_energy/search_energy,
src/lib.rs:303-376; stage list doc src/lib.rs:305-318).

Stages (Spark-first):
  1. λτ-graph (shared with the standard build).
  2. Heat diffusion G12: X ← X − η·L·X for `steps` iterations.
     Distributed as posexplode(features) → edge join → groupBy(node,
     feature) — a true dataflow formulation that scales with N×F;
     `localCheckpoint` per step caps lineage (SURVEY §7.3 risk 1).
  3. Edge trim G13a: drop edges below the `trim_quantile` weight
     quantile.
  4. Optical-token compression G14: seeded KMeans to ~optical_tokens
     centroids; centroid energy attributes (λ/e/dispersion means).
  5. Dispersion split G13b: centroids whose member-λ dispersion
     exceeds the `split_quantile` quantile are split once (2-means),
     bounded driver loop.
  6. search_energy G15: cosine-free scoring
     score = w_lambda·1/(1+|λ_q−λ_x|) + w_dirichlet·1/(1+|e_q−e_x|),
     centroid shortlist of `candidate_m` then exact member rescore.

The crate's exact energy-edge weighting is unpublished (SURVEY §2.11
spec gap); formulas here are pinned by our own golden tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..params import EnergyParams, GraphParams
from . import knn as knn_ops
from . import lambda_index as lam_ops


def diffusion_step(
    items: DataFrame,
    edges: DataFrame,
    eta: float,
    id_col: str = "item_id",
    feat_col: str = "features",
) -> DataFrame:
    """One heat-diffusion step: x_i ← (1 − η·deg_i)·x_i + η·Σ_j w_ij·x_j.

    Pure dataflow: features exploded to (node, feature_idx, value),
    neighbor contributions shuffled on (dst, feature_idx), then array
    re-assembled ordered by feature index. Scales as O(E·F) shuffle
    rows — no driver-side matrix.
    """
    both = edges.select("src", "dst", "weight").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "weight")
    )
    deg = both.groupBy(F.col("src").alias(id_col)).agg(
        F.sum("weight").alias("deg")
    )
    pos = items.select(
        id_col, F.posexplode(feat_col).alias("fi", "v")
    )
    neigh = (
        both.join(pos.withColumnRenamed(id_col, "src"), "src")
        .groupBy(F.col("dst").alias(id_col), "fi")
        .agg(F.sum(F.col("weight") * F.col("v")).alias("nsum"))
    )
    new_pos = (
        pos.join(deg, id_col, "left")
        .join(neigh, [id_col, "fi"], "left")
        .select(
            id_col, "fi",
            ((F.lit(1.0) - F.lit(eta) * F.coalesce("deg", F.lit(0.0)))
             * F.col("v")
             + F.lit(eta) * F.coalesce("nsum", F.lit(0.0))).alias("v"),
        )
    )
    return (
        new_pos.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("fi", "v"))).alias("fv"))
        .select(id_col, F.col("fv.v").alias(feat_col))
    )


def diffuse(items: DataFrame, edges: DataFrame, eta: float, steps: int,
            id_col: str = "item_id", feat_col: str = "features") -> DataFrame:
    out = items.select(id_col, feat_col)
    for _ in range(int(steps)):
        out = diffusion_step(out, edges, eta, id_col, feat_col)
        out = out.localCheckpoint(eager=False)
    return out


def trim_edges(edges: DataFrame, trim_quantile: float) -> DataFrame:
    """Drop the weakest `trim_quantile` fraction of edges."""
    if trim_quantile <= 0:
        return edges
    cut = edges.select(
        F.expr(f"percentile(weight, {float(trim_quantile)})").alias("c")
    ).collect()[0]["c"]
    return edges.filter(F.col("weight") >= F.lit(float(cut)))


@dataclass
class EnergyIndex:
    """Artifacts of the energy build: diffused+λ-indexed items, their
    centroid assignment, the compressed centroid table (the 'optical
    tokens'), the F×F Laplacian of the diffused space, and params."""

    items: DataFrame          # [item_id, features, lambda, e_raw, centroid_id]
    centroids: DataFrame      # [centroid_id, center, lambda_c, e_c, disp_c, n_members]
    edges: DataFrame
    feature_laplacian: np.ndarray
    graph_params: GraphParams
    energy_params: EnergyParams
    tau_synth: float

    @property
    def nnodes(self) -> int:
        """Energy-graph node count (reference logs nnodes=39..120)."""
        return self.centroids.count()


def build_energy(
    items: DataFrame,
    eparams: EnergyParams,
    gparams: GraphParams,
    id_col: str = "item_id",
    feat_col: str = "features",
) -> EnergyIndex:
    base = items.select(F.col(id_col).alias("item_id"),
                        F.col(feat_col).alias("features")).persist()
    first = base.select(F.size("features").alias("n")).first()
    n_features = int(first["n"])

    edges = knn_ops.knn_edges(base, gparams).persist()

    # G12: diffusion smoothing.
    diffused = diffuse(base, edges, eparams.eta, eparams.steps).persist()

    # G13a: trim weak edges before energy attribution.
    kept_edges = trim_edges(edges, eparams.trim_quantile).persist()

    # λ/e on the *diffused* space — one kernel pass for the
    # τ-independent components, τ-synthesis + blend JVM-side (same
    # single-pass pattern as the standard builder).
    lf = lam_ops.feature_laplacian(diffused, kept_edges, n_features)
    comp = lam_ops.with_energy_components(diffused, lf).persist()
    tau_row = comp.select(
        F.expr("percentile(_ec.e_raw, 0.5)").alias("m")).first()
    tau_synth = float(tau_row["m"]) if tau_row["m"] is not None else 0.0
    if not (tau_synth > 0.0):
        raise ValueError(
            "degenerate energy index: diffusion collapsed the spectrum "
            f"(median energy {tau_synth}); lower eta/steps "
            "(reference sweep shows collapse at eta=0.1, steps=8)"
        )
    indexed = comp.select(
        "*", F.col("_ec.e_raw").alias("e_raw")
    ).withColumn(
        "lambda", lam_ops.blend_lambda("_ec", tau_synth)
    ).drop("_ec").persist()

    # G14: optical-token compression (seeded KMeans).
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    k_tokens = int(eparams.optical_tokens or 40)
    fv = indexed.select("item_id", array_to_vector("features").alias("fv"))
    km = KMeans(k=k_tokens, seed=42, featuresCol="fv",
                predictionCol="centroid_id", maxIter=20)
    model = km.fit(fv)
    assigned = model.transform(fv).select("item_id", "centroid_id")
    with_c = indexed.join(assigned, "item_id")

    centroids = with_c.groupBy("centroid_id").agg(
        F.count("*").alias("n_members"),
        F.avg("lambda").alias("lambda_c"),
        F.avg("e_raw").alias("e_c"),
        F.stddev_pop("lambda").alias("disp_c"),
    )
    centers = model.clusterCenters()
    spark = items.sparkSession
    centers_df = spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(centers)],
        schema="centroid_id int, center array<double>",
    )
    centroids = centroids.join(centers_df, "centroid_id")

    # G13b: one bounded dispersion-split pass — centroids above the
    # split_quantile of disp_c are refined by a 2-means on their
    # members (driver loop over a handful of cluster ids).
    split_cut = centroids.select(
        F.expr(f"percentile(disp_c, {float(eparams.split_quantile)})").alias("c")
    ).collect()[0]["c"]
    to_split = [r["centroid_id"] for r in
                centroids.filter(F.col("disp_c") > F.lit(split_cut)
                                 + F.lit(float(eparams.split_tau))).collect()]
    if to_split:
        sub = with_c.filter(F.col("centroid_id").isin(to_split))
        sub_fv = sub.select("item_id", array_to_vector("features").alias("fv"))
        km2 = KMeans(k=min(2 * len(to_split), max(2, len(to_split) * 2)),
                     seed=43, featuresCol="fv",
                     predictionCol="sub_id", maxIter=10)
        m2 = km2.fit(sub_fv)
        re = m2.transform(sub_fv).select(
            "item_id",
            (F.col("sub_id") + F.lit(k_tokens)).alias("centroid_id"),
        )
        assigned = (
            assigned.join(re.select("item_id"), "item_id", "left_anti")
            .unionAll(re)
        )
        with_c = indexed.join(assigned, "item_id")
        # Recompute centroid attributes + centers (member means).
        centroids = with_c.groupBy("centroid_id").agg(
            F.count("*").alias("n_members"),
            F.avg("lambda").alias("lambda_c"),
            F.avg("e_raw").alias("e_c"),
            F.stddev_pop("lambda").alias("disp_c"),
        ).join(
            with_c.select("centroid_id",
                          F.posexplode("features").alias("fi", "v"))
            .groupBy("centroid_id", "fi").agg(F.avg("v").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("fi", "m"))).alias("fm"))
            .select("centroid_id", F.col("fm.m").alias("center")),
            "centroid_id",
        )

    return EnergyIndex(
        items=with_c,
        centroids=centroids.persist(),
        edges=kept_edges,
        feature_laplacian=lf,
        graph_params=gparams,
        energy_params=eparams,
        tau_synth=tau_synth,
    )


def search_energy(
    index: EnergyIndex,
    query: np.ndarray,
    k: int,
    w_lambda: float = 1.0,
    w_dirichlet: float = 0.5,
) -> DataFrame:
    """Cosine-free energy search (reference src/lib.rs:232-262):
    shortlist `candidate_m` centroids by energy score, exact-rescore
    their members, top-k. Returns DataFrame[query_id, item_id, score,
    rank]."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    lf = index.feature_laplacian
    if q.shape[1] != lf.shape[0]:
        raise ValueError(f"query has {q.shape[1]} features, index has {lf.shape[0]}")
    e_raw, _, s_val = lam_ops._lambda_kernel(q, lf, index.tau_synth)
    spark = index.items.sparkSession
    qdf = spark.createDataFrame(
        [(int(i), float(s), float(e)) for i, (s, e) in enumerate(zip(s_val, e_raw))],
        schema="query_id long, q_lambda double, q_e double",
    )
    cand_m = int(index.energy_params.candidate_m)
    wl, wd = float(w_lambda), float(w_dirichlet)

    cscore = (
        F.lit(wl) / (F.lit(1.0) + F.abs(F.col("q_lambda") - F.col("lambda_c")))
        + F.lit(wd) / (F.lit(1.0) + F.abs(F.col("q_e") - F.col("e_c")))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("centroid_id").asc()
    )
    shortlist = (
        index.centroids.join(F.broadcast(qdf))
        .withColumn("cscore", cscore)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= cand_m)
        .select("query_id", "centroid_id", "q_lambda", "q_e")
    )
    members = index.items.select("item_id", "centroid_id", "lambda", "e_raw")
    rescored = shortlist.join(members, "centroid_id").select(
        "query_id", "item_id",
        (F.lit(wl) / (F.lit(1.0) + F.abs(F.col("q_lambda") - F.col("lambda")))
         + F.lit(wd) / (F.lit(1.0) + F.abs(F.col("q_e") - F.col("e_raw")))
         ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("item_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(int(k)))
    )
