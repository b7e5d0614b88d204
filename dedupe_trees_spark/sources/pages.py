"""Pages-table readers beyond parquet.

All readers produce the same fixed schema (BASELINE.json input_hint) —
never inferred at runtime: schema inference reads data twice and can
silently flip types between partitions, which at 10^12 rows is both a
correctness and a planning hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("source_order", T.IntegerType(), True),
    ]
)

# JSONL carries html base64 (JSON has no binary type)
_JSONL_SCHEMA = T.StructType(
    [f if f.name != "html" else T.StructField("html", T.StringType(), True) for f in PAGES_SCHEMA]
)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(_JSONL_SCHEMA).json(path)
    return raw.withColumn("html", F.unbase64("html"))


def read_pages_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV dump reader (no html column — CSV can't carry binaries)."""
    schema = T.StructType([f for f in PAGES_SCHEMA if f.name != "html"])
    df = spark.read.schema(schema).option("header", True).csv(path)
    return df.withColumn("html", F.lit(None).cast("binary")).select(
        *[f.name for f in PAGES_SCHEMA]
    )


def read_pages_any(spark: SparkSession, path: str) -> DataFrame:
    """Dispatch on extension/prefix: iceberg:, .jsonl/.json, .csv,
    .warc/.warc.gz, parquet."""
    from dedupe_trees_spark.io import read_pages

    if path.endswith((".jsonl", ".json")):
        return read_pages_jsonl(spark, path)
    if path.endswith(".csv"):
        return read_pages_csv(spark, path)
    if path.endswith((".warc", ".warc.gz")):
        from dedupe_trees_spark.sources.warc import read_pages_warc

        return read_pages_warc(spark, path)
    return read_pages(spark, path)
