"""Relational / event-stream analytics operators.

These cover the harness-side relational surface (SURVEY §2.1 S4-S9,
§2.4 A6-A8, §2.5 W1-W4) plus batch forms of the streaming operators
(tumbling windows, sessionization, as-of joins) so the same semantics
run under Structured Streaming by swapping the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_before: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1-shaped pricing summary: grouped partial-aggregable
    metrics — Catalyst executes map-side combine then one shuffle."""
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(ship_before))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_customers_by_revenue(orders: DataFrame, customer: DataFrame,
                             nation: DataFrame, k: int = 5) -> DataFrame:
    """Top-k customers by order revenue per nation: join → agg →
    ranking window. customer/nation are small → broadcast joins."""
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )
    joined = (
        rev.join(F.broadcast(customer),
                 rev["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation),
              customer["c_nationkey"] == nation["n_nationkey"])
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        joined.select("n_name", "c_custkey", "c_name", "revenue")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.lit(k))
    )


def events_hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the
    Structured Streaming windowed agg — swap source to readStream and
    add a watermark for the streaming variant)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def asof_join_last_view(events: DataFrame) -> DataFrame:
    """As-of join: for every 'click', the most recent prior 'view' by
    the same user.

    Implemented as a single pass over a user-partitioned time-ordered
    window (last_value ignoreNulls) — one shuffle on user_id, no
    range join explosion; the classic scalable as-of pattern.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_prev = events.withColumn(
        "prev_view_ts",
        F.last(F.when(F.col("event_type") == "view", F.col("ts")),
               ignorenulls=True).over(w),
    )
    return (
        with_prev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "prev_view_ts")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds `gap_minutes`.

    Returns DataFrame[user_id, session_id, n_events, session_start,
    session_end]. One shuffle (user_id); running sum window assigns
    session ids without iteration.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(),
                                              F.col("event_id").asc())
    # timestampdiff is pure wall-clock arithmetic — identical for
    # TIMESTAMP and TIMESTAMP_NTZ, independent of session timezone.
    gap = F.expr("timestampdiff(SECOND, lag(ts) over "
                 "(partition by user_id order by ts asc, event_id asc), ts)")
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
