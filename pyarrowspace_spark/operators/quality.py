"""Training-corpus quality operators (LLM-data-pipeline layer).

Word-level repetition signals in the Gopher family (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 repetition filters —
public method), a PII scrubber (email / long-digit-run / URL
redaction), and temperature-based source-mixture weights (multinomial
sampling with exponent α, the standard multi-corpus recipe from GPT-3 /
XLM-R data work — public method).

Everything is pure Spark SQL (JVM codegen, shuffle only where an
aggregation is inherent); each operator has an exactly-equivalent
DuckDB oracle formulation in __spark_entry__.py. Regex patterns stay in
the Java∩RE2 common subset so both engines match the same spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

# Java regex and RE2 agree on these (no lookaround, no backrefs).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONG_DIGITS_RE = "[0-9]{9,}"
URL_RE = "https?://[^ ]+"

MIXTURE_ALPHA = 0.7  # temperature exponent; <1 upweights small sources


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-doc repetition metrics over the whitespace token stream:

    - ``distinct_ratio``   = distinct tokens / tokens (type-token ratio)
    - ``top_unigram_frac`` = count(w*)·len(w*) / Σ len(token) where w*
      is the MOST FREQUENT word (ties → lexicographically smallest) —
      Gopher's "fraction of characters in the most common word", Rae
      et al. 2021 §A1.1. (Ranking by count, not by count·len: a long
      rarer token must not out-score the most frequent word.)
    - ``top_bigram_frac``  = same for word 2-grams (spaces excluded
      from the character counts).

    Plan: one explode per n-gram order → partial-aggregated groupBy →
    per-doc top-1 by (count desc, gram asc) via max_by over a
    lexically ordered struct. Shuffle rows are (doc, gram) counts —
    never the raw text twice.
    """
    toks = docs.select(id_col, T.tokens(text_col).alias("tk"))
    base = toks.select(
        id_col,
        F.size("tk").alias("n_tokens"),
        F.size(F.array_distinct("tk")).alias("n_distinct"),
        F.aggregate("tk", F.lit(0),
                    lambda acc, t: acc + F.length(t)).alias("n_word_chars"),
    )

    def _top_gram_chars(counted: DataFrame, space_chars: int):
        """Char mass of the top gram by (count desc, gram asc): one
        row_number window over per-doc gram counts (already aggregated
        — the window input is |vocab| rows, not |tokens|)."""
        w = Window.partitionBy(id_col).orderBy(
            F.col("count").desc(), F.col("g").asc())
        return (
            counted.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                id_col,
                (F.col("count") * (F.length("g") - F.lit(space_chars))
                 ).alias("_chars"),
            )
        )

    uni = _top_gram_chars(
        toks.select(id_col, F.explode("tk").alias("g"))
        .groupBy(id_col, "g").count(), 0,
    ).withColumnRenamed("_chars", "top_uni_chars")
    bi = _top_gram_chars(
        toks.select(id_col, F.explode(
            F.zip_with(F.slice("tk", 1, F.greatest(F.size("tk") - 1, F.lit(0))),
                       F.slice("tk", 2, F.greatest(F.size("tk") - 1, F.lit(0))),
                       lambda a, b: F.concat_ws(" ", a, b))).alias("g"))
        .groupBy(id_col, "g").count(), 1,
    ).withColumnRenamed("_chars", "top_bi_chars")
    return (
        base.join(uni, id_col, "left").join(bi, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.when(F.col("n_tokens") > 0,
                   F.col("n_distinct") / F.col("n_tokens"))
             .otherwise(F.lit(0.0)).alias("distinct_ratio"),
            F.when(F.col("n_word_chars") > 0,
                   F.coalesce("top_uni_chars", F.lit(0))
                   / F.col("n_word_chars"))
             .otherwise(F.lit(0.0)).alias("top_unigram_frac"),
            F.when(F.col("n_word_chars") > 0,
                   F.coalesce("top_bi_chars", F.lit(0))
                   / F.col("n_word_chars"))
             .otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


def scrub_pii(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails → ``<EMAIL>``, ≥9-digit runs → ``<NUM>``, URLs →
    ``<URL>``; report per-doc redaction counts and the scrubbed text.

    Narrow (zero shuffle): three regexp passes inside one projection.
    At 100 TB this is the canonical cheap-scan shape — the scan cost
    dominates, the regexes ride along.
    """
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_url = F.size(F.regexp_extract_all(after_email, F.lit(URL_RE), F.lit(0)))
    after_url = F.regexp_replace(after_email, URL_RE, "<URL>")
    n_num = F.size(F.regexp_extract_all(after_url, F.lit(LONG_DIGITS_RE),
                                        F.lit(0)))
    scrubbed = F.regexp_replace(after_url, LONG_DIGITS_RE, "<NUM>")
    return docs.select(
        id_col,
        n_email.cast("long").alias("n_emails"),
        n_url.cast("long").alias("n_urls"),
        n_num.cast("long").alias("n_digit_runs"),
        scrubbed.alias("scrubbed_text"),
    )


def source_mixture_weights(docs: DataFrame, alpha: float = MIXTURE_ALPHA,
                           source_col: str = "source",
                           text_col: str = "text") -> DataFrame:
    """Per-source corpus stats + temperature-α sampling weights:
    w_s ∝ (tokens_s / Σtokens)^α, normalized to Σw = 1. α < 1 flattens
    the mixture toward small sources (multinomial temperature sampling,
    public multi-corpus training recipe).

    One groupBy(source) — map-side combinable — then a scalar total via
    a window over the tiny per-source frame.
    """
    per_src = docs.select(
        source_col, T.token_count(text_col).alias("n_tok")
    ).groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    raw = F.pow(F.col("n_tokens") / F.sum("n_tokens").over(w_all),
                F.lit(float(alpha)))
    return per_src.select(
        source_col, "n_docs", "n_tokens",
        (raw / F.sum(raw).over(w_all)).alias("weight"),
    )


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      seed: int = 7, id_col: str = "doc_id",
                      strata_col: str = "source") -> DataFrame:
    """EXACT deterministic stratified sample: from every stratum s
    listed in `fractions`, keep the first ceil(frac_s · n_s) rows in
    md5-rank order (rank key = md5("<seed>|<id>"), ties broken by id).
    Strata absent from `fractions` are dropped — pair with
    `source_mixture_weights` to materialize a target mixture (the
    reference leaves corpus sampling to the caller: its BEIR harness
    subsets the corpus driver-side with a numpy RNG, ref
    tests/test_3_beir.py:159-189 — non-reproducible across engines,
    which is exactly what the md5 rank replaces).

    Cross-engine reproducible BY VALUE, not just by count: md5 of the
    same UTF-8 string is the same lowercase hex in Spark and DuckDB,
    so the oracle selects the identical row set — unlike
    `df.sample`/`TABLESAMPLE`, whose RNG streams are engine-private.
    This also makes the sample stable under repartitioning: membership
    depends only on (seed, id, stratum census), never on row order or
    partition count.

    Plan at scale: ONE exchange on `strata_col` — the rank window and
    the stratum-count window share the same partitioning, so Catalyst
    plans a single shuffle; the per-stratum quota join is a broadcast
    (the fractions table is tiny by construction). Skew is bounded by
    the largest stratum: for mega-strata (≫ one executor's sort
    budget) switch to the two-pass threshold form — aggregate stratum
    counts map-side, then filter rows with rank-hash below the
    stratum's quota quantile — which trades exactness of the boundary
    row for a sort-free scan; this operator keeps the exact window
    form, correct wherever a stratum fits a task's external sort.
    """
    spark = docs.sparkSession
    fr = spark.createDataFrame(
        [(str(s), float(f)) for s, f in sorted(fractions.items())],
        schema=f"{strata_col} string, _frac double")
    rk = F.md5(F.concat_ws("|", F.lit(str(int(seed))),
                           F.col(id_col).cast("string")))
    w_rank = Window.partitionBy(strata_col).orderBy(rk, id_col)
    w_cnt = Window.partitionBy(strata_col)
    return (
        docs.join(F.broadcast(fr), strata_col)
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_cnt))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.col("_frac")))
        .drop("_rn", "_n", "_frac")
    )


def mixture_sample(docs: DataFrame, total_tokens: int,
                   alpha: float = MIXTURE_ALPHA, seed: int = 7,
                   id_col: str = "doc_id", text_col: str = "text",
                   source_col: str = "source") -> DataFrame:
    """Materialize a ~`total_tokens` training corpus at temperature α:
    per-source token budgets ceil(w_s · T) from
    `source_mixture_weights`, then docs taken in md5("<seed>|<id>")
    rank order until each source's budget is exhausted (the boundary
    doc that crosses its budget is INCLUDED — packing semantics, ≤ one
    doc of overshoot per source, same rule as `shard_by_tokens`'s
    shard boundaries). The end-to-end "make me a T-token corpus with
    this mixture" primitive the weights op stops short of.

    Deterministic by (seed, census): membership survives
    repartitioning and is identical in the DuckDB oracle (md5 hex and
    the ordered cumulative sum agree across engines). A source whose
    corpus is smaller than its budget contributes everything — the
    realized total can undershoot T (document-level sampling cannot
    conjure tokens; re-run with a larger α-flattened budget or
    upsample externally if T is a hard floor).

    Plan at scale: two passes over `docs` — one map-side-combinable
    groupBy for the census/weights (tiny result, broadcast back), one
    windowed pass partitioned by source (rank + running token sum
    share the single exchange). Same skew note as
    `stratified_sample`: a mega-stratum bounds the sort; the
    threshold-form fallback applies unchanged.
    """
    w = source_mixture_weights(docs, alpha=alpha, source_col=source_col,
                               text_col=text_col)
    # budgets from the 9-decimal-ROUNDED weight: pow() can differ by a
    # last ulp across engines, and an unrounded w·T landing exactly on
    # an integer would flip ceil() — and with it a boundary doc's
    # membership — between this plan and its SQL oracle twin. Rounding
    # first pins the budget to the same value everywhere (9 decimals ≫
    # any real mixture precision; same rounding source_mixture reports)
    budget = w.select(
        source_col,
        F.ceil(F.round(F.col("weight"), 9) * F.lit(float(total_tokens)))
        .cast("long").alias("_tok_budget"))
    rk = F.md5(F.concat_ws("|", F.lit(str(int(seed))),
                           F.col(id_col).cast("string")))
    # explicit ROWS frame: the (md5, id) ordering is unique so
    # RANGE≡ROWS, but both engines' defaults are RANGE — spell out the
    # frame the oracle replays rather than lean on tie-free ordering
    w_rank = (Window.partitionBy(source_col).orderBy(rk, id_col)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        docs.join(F.broadcast(budget), source_col)
        .withColumn("_n_tok", T.token_count(text_col).cast("long"))
        .withColumn("_cum", F.sum("_n_tok").over(w_rank))
        .filter(F.col("_cum") - F.col("_n_tok") < F.col("_tok_budget"))
        .drop("_tok_budget", "_cum")
    )
