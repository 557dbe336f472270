"""IR evaluation metrics as DataFrame transforms (SURVEY §2.8 M1-M7).

Inputs follow the engine's result shape:
  rankings: DataFrame[query_id, item_id, rank]   (rank 1-based)
  qrels:    DataFrame[query_id, item_id, relevance>0]

Every metric is a join + window/agg — partial-aggregable, one shuffle
on query_id. Reference semantics cited per function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(rankings: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Recall@k = |top-k ∩ relevant| / |relevant| per query
    (reference tests/test_3_beir.py:262-268)."""
    n_rel = qrels.groupBy("query_id").agg(F.count("*").alias("n_relevant"))
    hits = (
        rankings.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "item_id"])
        .groupBy("query_id").agg(F.count("*").alias("n_hit"))
    )
    return (
        n_rel.join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_relevant"))
            .alias("recall"),
        )
    )


def mrr(rankings: DataFrame, qrels: DataFrame) -> DataFrame:
    """MRR = 1/rank of first relevant hit, 0 if none
    (reference tests/test_3_beir.py:271-277)."""
    first_hit = (
        rankings.join(qrels, ["query_id", "item_id"])
        .groupBy("query_id").agg(F.min("rank").alias("first_rank"))
    )
    all_q = rankings.select("query_id").distinct()
    return all_q.join(first_hit, "query_id", "left").select(
        "query_id",
        F.coalesce(F.lit(1.0) / F.col("first_rank"), F.lit(0.0)).alias("mrr"),
    )


def ndcg_at_k(rankings: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """Graded nDCG@k with log2(rank+1) discounts; ideal DCG from the
    relevance-sorted prefix (reference tests/test_3_beir.py:224-259)."""
    dcg = (
        rankings.filter(F.col("rank") <= k)
        .join(qrels, ["query_id", "item_id"])
        .groupBy("query_id")
        .agg(F.sum(F.col("relevance") /
                   F.log2(F.col("rank") + 1)).alias("dcg"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("relevance").desc(), F.col("item_id").asc()
    )
    ideal = (
        qrels.withColumn("irank", F.row_number().over(w))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("relevance") /
                   F.log2(F.col("irank") + 1)).alias("idcg"))
    )
    return (
        ideal.join(dcg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)).alias("ndcg"),
        )
    )


def map_at_k(rankings: DataFrame, qrels: DataFrame, k: int) -> DataFrame:
    """MAP@k: mean over relevant hits of precision-at-hit-rank
    (reference tests/test_8_CVE_db_sweep.py:127-151)."""
    from pyspark.sql import Window

    topk = rankings.filter(F.col("rank") <= k)
    hits = topk.join(qrels.select("query_id", "item_id"),
                     ["query_id", "item_id"])
    w = Window.partitionBy("query_id").orderBy("rank")
    prec = hits.withColumn("n_hits_so_far", F.row_number().over(w)).select(
        "query_id", (F.col("n_hits_so_far") / F.col("rank")).alias("p_at_hit")
    )
    n_rel = qrels.groupBy("query_id").agg(F.count("*").alias("n_relevant"))
    ap = prec.groupBy("query_id").agg(F.sum("p_at_hit").alias("sum_p"))
    all_q = rankings.select("query_id").distinct()
    return (
        all_q.join(ap, "query_id", "left").join(n_rel, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("sum_p"), F.lit(0.0)) /
             F.least(F.coalesce(F.col("n_relevant"), F.lit(1)), F.lit(k)))
            .alias("map"),
        )
    )


def spearman_rho(rank_a: DataFrame, rank_b: DataFrame) -> DataFrame:
    """Spearman ρ between two rankings on their shared items, per query
    (reference tests/test_2_CVE_db.py:159-174): Pearson corr of ranks
    re-densified over the intersection."""
    from pyspark.sql import Window

    j = rank_a.select("query_id", "item_id",
                      F.col("rank").alias("ra")).join(
        rank_b.select("query_id", "item_id", F.col("rank").alias("rb")),
        ["query_id", "item_id"],
    )
    wa = Window.partitionBy("query_id").orderBy("ra", "item_id")
    wb = Window.partitionBy("query_id").orderBy("rb", "item_id")
    dense = j.withColumn("da", F.row_number().over(wa)).withColumn(
        "db", F.row_number().over(wb)
    )
    return dense.groupBy("query_id").agg(
        F.corr(F.col("da").cast("double"),
               F.col("db").cast("double")).alias("spearman")
    )


def kendall_tau(rank_a: DataFrame, rank_b: DataFrame) -> DataFrame:
    """Kendall τ between two rankings on shared items per query
    (reference tests/test_2_CVE_db.py:159-174): (C - D) / (n(n-1)/2)
    over all item pairs — an O(k²)-per-query pair join, fine for the
    top-k lists this is used on (k ≤ 25 in the reference harness)."""
    j = rank_a.select("query_id", "item_id", F.col("rank").alias("ra")).join(
        rank_b.select("query_id", "item_id", F.col("rank").alias("rb")),
        ["query_id", "item_id"],
    )
    pairs = (
        j.alias("x")
        .join(j.alias("y"),
              (F.col("x.query_id") == F.col("y.query_id"))
              & (F.col("x.item_id") < F.col("y.item_id")))
        .select(
            F.col("x.query_id").alias("query_id"),
            (F.signum(F.col("x.ra") - F.col("y.ra"))
             * F.signum(F.col("x.rb") - F.col("y.rb"))).alias("concord"),
        )
    )
    n = j.groupBy("query_id").agg(F.count("*").alias("n"))
    s = pairs.groupBy("query_id").agg(F.sum("concord").alias("s"))
    return n.join(s, "query_id").select(
        "query_id",
        (F.col("s") / (F.col("n") * (F.col("n") - 1) / 2)).alias("kendall"),
    )


def head_tail_stats(rankings: DataFrame, head_k: int = 3,
                    tail_k: int = 15) -> DataFrame:
    """Head/tail score-distribution stats per query (reference tail
    analysis, tests/test_2_CVE_db.py:201-243): head mean (ranks
    1..head_k), tail mean/std (ranks head_k+1..tail_k), tail/head
    ratio. Expects a `score` column."""
    in_range = rankings.filter(F.col("rank") <= tail_k)
    is_head = F.col("rank") <= head_k
    agg = in_range.groupBy("query_id").agg(
        F.avg(F.when(is_head, F.col("score"))).alias("head_mean"),
        F.avg(F.when(~is_head, F.col("score"))).alias("tail_mean"),
        F.stddev_samp(F.when(~is_head, F.col("score"))).alias("tail_std"),
    )
    return agg.select(
        "query_id", "head_mean", "tail_mean", "tail_std",
        (F.col("tail_mean") / F.col("head_mean")).alias("tail_head_ratio"),
    )


def rbo(rank_a: DataFrame, rank_b: DataFrame, p: float = 0.9,
        max_depth: int = 10) -> DataFrame:
    """Rank-biased overlap at depths 1..max_depth
    (reference tests/test_6_beir_new_score.py:393-406):
    RBO ≈ (1-p) Σ_d p^(d-1) · |A_d ∩ B_d| / d   (prefix overlap form).
    """
    depths = list(range(1, max_depth + 1))
    out = None
    for d in depths:
        a_d = rank_a.filter(F.col("rank") <= d).select("query_id", "item_id")
        b_d = rank_b.filter(F.col("rank") <= d).select("query_id", "item_id")
        ov = (
            a_d.join(b_d, ["query_id", "item_id"])
            .groupBy("query_id")
            .agg((F.count("*") / F.lit(float(d))).alias(f"ov_{d}"))
        )
        out = ov if out is None else out.join(ov, "query_id", "outer")
    weight = [(1 - p) * (p ** (d - 1)) for d in depths]
    expr = None
    for d, w_ in zip(depths, weight):
        term = F.coalesce(F.col(f"ov_{d}"), F.lit(0.0)) * F.lit(w_)
        expr = term if expr is None else expr + term
    return out.select("query_id", expr.alias("rbo"))


#: Simpson intervals for the Student-t integral — error O(h⁴) ≈ 1e-13
#: at |t|≲10, far below the 1e-9 oracle tolerance.
T_SIMPSON_M = 2000


def student_t_two_sided_p(t: Column, nu: Column,
                          m: int = T_SIMPSON_M) -> Column:
    """Two-sided Student-t p-value P(|T_ν| > |t|) as a pure column
    expression (public math, no scipy):

      pdf(x) = C(ν)·(1 + x²/ν)^(−(ν+1)/2),
      C(ν)   = Γ((ν+1)/2) / (√(νπ)·Γ(ν/2)),
      p      = 1 − 2·∫₀^{|t|} pdf.

    The Γ-ratio R(ν) = Γ((ν+1)/2)/Γ(ν/2) is exact via the recurrence
    R(ν) = ((ν−1)/2)/R(ν−1), R(1) = 1/√π — a fold over sequence(2..ν).
    The integral is fixed-grid Simpson (M intervals), so the identical
    arithmetic runs in DuckDB for the oracle. Everything stays inside
    whole-stage codegen: no UDF, no collect.
    """
    import math

    t_abs = F.abs(t)
    nu_d = nu.cast("double")
    r0 = F.lit(1.0 / math.sqrt(math.pi))
    gamma_ratio = F.when(
        nu >= F.lit(2),
        F.aggregate(
            F.sequence(F.lit(2), nu.cast("int")),
            r0,
            lambda acc, i: ((i.cast("double") - F.lit(1.0)) / F.lit(2.0)) / acc,
        ),
    ).otherwise(r0)
    c = gamma_ratio / F.sqrt(nu_d * F.lit(math.pi))
    h = t_abs / F.lit(float(m))

    def pdf(x: Column) -> Column:
        return c * F.pow(F.lit(1.0) + (x * x) / nu_d,
                         -(nu_d + F.lit(1.0)) / F.lit(2.0))

    # Simpson weights: 1 at the ends, 4 on odd, 2 on even interior nodes.
    simpson = F.aggregate(
        F.sequence(F.lit(0), F.lit(int(m))),
        F.lit(0.0),
        lambda acc, i: acc
        + F.when((i == 0) | (i == F.lit(int(m))), F.lit(1.0))
           .when(i % 2 == 1, F.lit(4.0))
           .otherwise(F.lit(2.0))
        * pdf(i.cast("double") * h),
    ) * h / F.lit(3.0)
    p = F.lit(1.0) - F.lit(2.0) * simpson
    return F.when(t.isNotNull(), F.greatest(F.least(p, F.lit(1.0)),
                                            F.lit(0.0)))


def paired_ttest(metric_a: DataFrame, metric_b: DataFrame,
                 value_col: str = "value") -> DataFrame:
    """Paired t-test over per-query metric pairs (reference
    tests/test_3_beir.py:357-381 uses scipy.stats.ttest_rel; same
    statistic AND two-sided p-value in closed form from aggregate
    moments — no scipy, no collect): t = mean(d)/(stddev_samp(d)/√n),
    p = P(|T_{n−1}| > |t|) via `student_t_two_sided_p`.

    Inputs: DataFrame[query_id, value] each. Output one row
    [n, mean_diff, std_diff, t_stat, p_value].
    """
    joined = metric_a.select("query_id", F.col(value_col).alias("a")).join(
        metric_b.select("query_id", F.col(value_col).alias("b")), "query_id"
    )
    d = joined.select((F.col("a") - F.col("b")).alias("d"))
    agg = d.agg(
        F.count("*").cast("long").alias("n"),
        F.avg("d").alias("mean_diff"),
        F.stddev_samp("d").alias("std_diff"),
        (F.avg("d") / (F.stddev_samp("d") / F.sqrt(F.count("*"))))
        .alias("t_stat"),
    )
    return agg.withColumn(
        "p_value",
        student_t_two_sided_p(F.col("t_stat"), F.col("n") - F.lit(1)),
    )


def ndcg_vs_reference(reference: DataFrame, test: DataFrame,
                      k: int) -> DataFrame:
    """nDCG of `test` rankings against `reference` rankings as graded
    truth (reference tests/test_2_CVE_db.py:176-199): the item at
    0-based index i of the reference list has relevance k−i; items
    absent from the reference list score 0. IDCG is the reference
    order's own DCG — a constant Σ_{i=1..k} (k−i+1)/log2(i+1).

    Both inputs: DataFrame[query_id, item_id, rank] (rank 1-based,
    already truncated to a common k — reference trims to the common
    min length first, tests/test_2_CVE_db.py:590-596).
    """
    import math

    kk = int(k)
    idcg = sum((kk - i + 1) / math.log2(i + 1) for i in range(1, kk + 1))
    rel = reference.select(
        "query_id", "item_id",
        (F.lit(kk) - F.col("rank") + 1).cast("double").alias("rel"),
    )
    return (
        test.join(rel, ["query_id", "item_id"], "left")
        .groupBy("query_id")
        .agg((F.sum(F.coalesce("rel", F.lit(0.0))
                    / F.log2(F.col("rank") + 1)) / F.lit(idcg)).alias("ndcg"))
    )
