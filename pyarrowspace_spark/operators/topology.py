"""Graph-topology operators (SURVEY §2.7 G16-G20, §2.8 M8-M9).

All operate on the engine's canonical undirected weighted edge list
DataFrame[src, dst, weight] (one row per edge, src < dst) — the same
artifact the index build produces — so topology metrics run directly
on the λτ-graph without conversion. No GraphFrames dependency:
iterative ops are driver-bounded loops over edge joins with
localCheckpoint, the Pregel pattern expressed as dataflow.

Reference counterparts are NetworkX calls in the test harness
(tests/test_6_beir_new_score.py:240-325).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _both_dirs(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst", "weight").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                     "weight")
    )


def weighted_degrees(edges: DataFrame) -> DataFrame:
    return _both_dirs(edges).groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("degree")
    )


def personalized_pagerank(
    edges: DataFrame,
    sources: list[int],
    alpha: float = 0.85,
    iters: int = 8,
) -> DataFrame:
    """PPR by fixed-iteration power method (reference
    tests/test_6_beir_new_score.py:268-280, α=0.85):

      pr_{t+1}(v) = (1-α)·[v = s] + α·Σ_u pr_t(u)·w_uv/deg_u

    All sources propagate simultaneously (source is a key column), so
    the per-iteration cost is one shuffle regardless of |sources|.
    Returns DataFrame[source, node, ppr].
    """
    spark = edges.sparkSession
    both = _both_dirs(edges)
    deg = weighted_degrees(edges)
    trans = both.join(deg, both["src"] == deg["node"]).select(
        "src", "dst", (F.col("weight") / F.col("degree")).alias("p")
    ).persist()

    init = spark.createDataFrame(
        [(int(s), int(s), 1.0) for s in sources],
        schema="source long, node long, ppr double",
    )
    restart = spark.createDataFrame(
        [(int(s), int(s)) for s in sources], schema="source long, node long"
    ).withColumn("r", F.lit(1.0 - alpha))

    pr = init
    for _ in range(int(iters)):
        spread = (
            pr.join(trans, pr["node"] == trans["src"])
            .groupBy("source", F.col("dst").alias("node"))
            .agg((F.lit(alpha) * F.sum(F.col("ppr") * F.col("p"))).alias("ppr"))
        )
        pr = (
            spread.join(restart, ["source", "node"], "outer")
            .select(
                "source", "node",
                (F.coalesce("ppr", F.lit(0.0)) + F.coalesce("r", F.lit(0.0))
                 ).alias("ppr"),
            )
        )
        pr = pr.localCheckpoint(eager=False)
    return pr


def conductance(edges: DataFrame, node_set: DataFrame,
                node_col: str = "node") -> float:
    """Conductance φ(S) = cut(S, V∖S) / min(vol(S), vol(V∖S))
    (reference tests/test_6_beir_new_score.py:282-292)."""
    s = node_set.select(F.col(node_col).alias("_n")).distinct()
    marked = (
        edges
        .join(s.withColumnRenamed("_n", "src").withColumn("_in_s", F.lit(1)),
              "src", "left")
        .withColumnRenamed("_in_s", "src_in")
        .join(s.withColumnRenamed("_n", "dst").withColumn("_in_s", F.lit(1)),
              "dst", "left")
        .withColumnRenamed("_in_s", "dst_in")
        .select(
            "weight",
            F.coalesce("src_in", F.lit(0)).alias("si"),
            F.coalesce("dst_in", F.lit(0)).alias("di"),
        )
    )
    agg = marked.agg(
        F.sum(F.when(F.col("si") != F.col("di"), F.col("weight"))
              .otherwise(F.lit(0.0))).alias("cut"),
        F.sum((F.col("si") + F.col("di")) * F.col("weight")).alias("vol_s"),
        F.sum(F.lit(2.0) * F.col("weight")).alias("vol_total"),
    ).collect()[0]
    cut, vol_s, vol_total = agg["cut"], agg["vol_s"], agg["vol_total"]
    denom = min(vol_s, vol_total - vol_s)
    return float(cut / denom) if denom > 0 else 0.0


def modularity(edges: DataFrame, communities: DataFrame,
               node_col: str = "node", comm_col: str = "community") -> DataFrame:
    """Per-community modularity terms Q_c = in_c/m − (deg_c/(2m))²
    (sum over c = standard weighted modularity). Returns
    DataFrame[community, q_c, in_weight, deg_sum]."""
    comm = communities.select(F.col(node_col).alias("_n"),
                              F.col(comm_col).alias("_c"))
    e = (
        edges
        .join(comm.withColumnRenamed("_n", "src")
              .withColumnRenamed("_c", "c_src"), "src")
        .join(comm.withColumnRenamed("_n", "dst")
              .withColumnRenamed("_c", "c_dst"), "dst")
    )
    m = edges.agg(F.sum("weight")).collect()[0][0]
    in_w = (
        e.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("community"))
        .agg(F.sum("weight").alias("in_weight"))
    )
    deg = weighted_degrees(edges).join(
        comm.withColumnRenamed("_n", "node"), "node"
    ).groupBy(F.col("_c").alias("community")).agg(
        F.sum("degree").alias("deg_sum")
    )
    return deg.join(in_w, "community", "left").select(
        "community",
        F.coalesce("in_weight", F.lit(0.0)).alias("in_weight"),
        "deg_sum",
        (F.coalesce("in_weight", F.lit(0.0)) / F.lit(m)
         - F.pow(F.col("deg_sum") / F.lit(2.0 * m), F.lit(2.0))).alias("q_c"),
    )


def label_propagation(edges: DataFrame, iters: int = 4) -> DataFrame:
    """Synchronous weighted label propagation (deterministic stand-in
    for the reference's greedy modularity communities, G17 — algorithm
    difference documented per SURVEY §2.7).

    Init: community = node id. Step: each node adopts the community
    with the largest incident weight sum; ties break to the SMALLEST
    community id (total order → deterministic under any shuffle).
    Returns DataFrame[node, community].
    """
    both = _both_dirs(edges).persist()
    labels = both.select(F.col("src").alias("node")).distinct().withColumn(
        "community", F.col("node")
    )
    for _ in range(int(iters)):
        votes = (
            both.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "community")
            .agg(F.sum("weight").alias("w"))
        )
        w = Window.partitionBy("node").orderBy(
            F.col("w").desc(), F.col("community").asc()
        )
        new_labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "community")
        )
        # isolated nodes keep their community
        labels = (
            labels.join(new_labels.withColumnRenamed("community", "_new"),
                        "node", "left")
            .select("node", F.coalesce("_new", "community").alias("community"))
            .localCheckpoint(eager=False)
        )
    return labels


def community_share(result_set: DataFrame, communities: DataFrame,
                    node_col: str = "node") -> DataFrame:
    """Max community share of a per-query result set (reference
    modularity-delta metric, tests/test_6_beir_new_score.py:294-304).
    result_set: DataFrame[query_id, node]. Returns
    DataFrame[query_id, max_share]."""
    joined = result_set.join(
        communities.withColumnRenamed("node", node_col), node_col
    )
    per_comm = joined.groupBy("query_id", "community").agg(
        F.count("*").alias("n")
    )
    tot = joined.groupBy("query_id").agg(F.count("*").alias("tot"))
    return (
        per_comm.join(tot, "query_id")
        .groupBy("query_id")
        .agg(F.max(F.col("n") / F.col("tot")).alias("max_share"))
    )


def topology_factor(
    ppr: DataFrame,
    conductance_value: float,
    max_share: DataFrame,
) -> DataFrame:
    """T_i = 0.4·PPR + 0.3·(1−conductance) + 0.3·modularity_share
    (reference tests/test_6_beir_new_score.py:306-325, weights :52-53).
    ppr: [source, node, ppr] aligned to (query, item)."""
    base = ppr.select(F.col("source").alias("query_id"),
                      F.col("node").alias("item_id"), "ppr")
    return base.join(max_share, "query_id", "left").select(
        "query_id", "item_id",
        (F.lit(0.4) * F.col("ppr")
         + F.lit(0.3) * F.lit(1.0 - conductance_value)
         + F.lit(0.3) * F.coalesce("max_share", F.lit(0.0))).alias("t_factor"),
    )
