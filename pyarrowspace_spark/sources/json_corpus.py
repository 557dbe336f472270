"""CVE-style nested-JSON corpus source/sink (SURVEY §2.1 S4-S5,
S7-S9).

The reference harness globs `**/*.json`, keeps files whose PATH
contains a year in [start, end], parses nested CVE records skipping
malformed ones, and flattens (id, title, descriptions, CVSS) into one
" | "-joined text (tests/test_2_CVE_db.py:71-128). Spark-first:
`recursiveFileLookup` + `input_file_name()` rlike predicate +
PERMISSIVE mode with an explicit schema (no inference pass — at 100 TB
schema inference is a full extra scan), then SQL struct access /
`transform` / `array_join` for the flatten — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

CVE_SCHEMA = StructType([
    StructField("cve_id", StringType(), True),
    StructField("year", LongType(), True),
    StructField("info", StructType([
        StructField("title", StringType(), True),
        StructField("descriptions", ArrayType(StructType([
            StructField("lang", StringType(), True),
            StructField("value", StringType(), True),
        ])), True),
        StructField("cvss", StructType([
            StructField("score", DoubleType(), True),
        ]), True),
    ]), True),
])


def to_cve_like_json(docs: DataFrame) -> DataFrame:
    """Derive a deterministic nested CVE-shaped record per document:
    year = 2000 + doc_id % 26, two descriptions (full text + upper
    snippet), CVSS score from n_chars. Pure column expressions."""
    year = (F.lit(2000) + F.col("doc_id") % 26).cast("long")
    return docs.select(
        F.concat(F.lit("CVE-"), year.cast("string"), F.lit("-"),
                 F.lpad(F.col("doc_id").cast("string"), 6, "0")
                 ).alias("cve_id"),
        year.alias("year"),
        F.struct(
            F.substring("text", 1, 40).alias("title"),
            F.array(
                F.struct(F.lit("en").alias("lang"), F.col("text").alias("value")),
                F.struct(F.col("lang").alias("lang"),
                         F.upper(F.substring("text", 1, 20)).alias("value")),
            ).alias("descriptions"),
            F.struct((F.round(F.col("n_chars") / 100.0, 2)).alias("score")
                     ).alias("cvss"),
        ).alias("info"),
    )


def write_json_corpus(records: DataFrame, path: str) -> None:
    """Year-partitioned JSON sink (dirs carry `year=YYYY`, mirroring
    the reference's year-in-path layout)."""
    records.write.partitionBy("year").mode("overwrite").json(path)


def read_json_corpus(
    spark: SparkSession,
    path: str,
    year_start: int,
    year_end: int,
) -> DataFrame:
    """Recursive JSON scan with the year-range PATH predicate applied
    before parsing costs anything downstream (reference
    iter_cve_json, tests/test_2_CVE_db.py:71-79). PERMISSIVE mode:
    malformed records become nulls and are dropped, not errors."""
    years = "|".join(str(y) for y in range(int(year_start), int(year_end) + 1))
    return (
        spark.read.schema(CVE_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("mode", "PERMISSIVE")
        .json(path)
        .withColumn("_path", F.input_file_name())
        .filter(F.col("_path").rlike(f"year=({years})/"))
        .filter(F.col("cve_id").isNotNull())
        .drop("_path")
    )


def extract_text(records: DataFrame) -> DataFrame:
    """Flatten nested CVE record → (cve_id, title, flat_text, score):
    flat_text joins title, every description value, and the CVSS score
    with " | " (reference extract_text, tests/test_2_CVE_db.py:81-128)."""
    desc_vals = F.transform(F.col("info.descriptions"), lambda d: d["value"])
    return records.select(
        "cve_id",
        F.col("info.title").alias("title"),
        F.concat_ws(
            " | ",
            F.concat(F.array(F.col("info.title")), desc_vals,
                     F.array(F.format_string("%.2f", F.col("info.cvss.score")))),
        ).alias("flat_text"),
        F.col("info.cvss.score").alias("score"),
    )
