"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

All loads are plain `spark.read.parquet` — predicate pushdown and
column pruning reach the scan for free. `items_from_embeddings`
standardizes the vector table into the engine's index-input shape
(float embeddings cast to double once, at the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a single-small-file scan up to the session's
    parallelism. A one-file local table arrives as ONE partition, which
    serializes every downstream per-row kernel on one core; at real
    scale tables come pre-split into many files and this is a no-op.
    Filters/pruning still push through the round-robin exchange."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(8, p):
        return df.repartition(p)
    return df


# Tables whose consumers run expensive per-row kernels (tokenize /
# shingle / hash chains). Cheap codegen scans+aggs (lineitem etc.) are
# NOT spread — the exchange costs more than single-pass codegen saves.
_SPREAD_TABLES = {"documents"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in _SPREAD_TABLES:
        df = _spread(spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events and expose both `ts_us` (epoch micros, timezone-proof
    — matches DuckDB's micro truncation) and a TIMESTAMP-typed `ts` for
    timestamp operators. Handles all three physical encodings the driver
    has generated across rounds: TIMESTAMP(NANOS) (read as long via the
    legacy conf), TIMESTAMP_NTZ (parquet timestamp[us] with no tz — the
    session TZ is pinned UTC so the cast to TIMESTAMP is value-identity,
    exactly what DuckDB computes from the naive value), and TIMESTAMP."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = (
            raw.withColumn("ts_us", F.expr("ts div 1000"))  # integer div —
            # float division would lose precision above 2^53 nanos
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    else:
        if ts_type == "timestamp_ntz":
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        raw = raw.withColumn("ts_us", F.unix_micros("ts"))
    return raw


def items_from_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.parquet → DataFrame[item_id, features array<double>, label]."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("item_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("features"),
        "label",
    )
