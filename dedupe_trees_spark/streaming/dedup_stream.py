"""Incremental exact-dedup over a stream of pages.

The batch pipeline owns near-dup clustering; this stream keeps a
canonical view fresh between batch runs, the way a web-scale ingest
actually operates: new WARC partitions arrive continuously, exact dups
(byte-identical text) are dropped in-flight, and the periodic batch job
re-clusters near-dups.

Mechanics: ``readStream`` over a pages directory → content hash →
``dropDuplicatesWithinWatermark`` keyed on (content_hash) with a
watermark on warc_ts, so dedup state for a hash is EVICTED once the
watermark passes its last-seen event time (duplicates arriving later
than the watermark slack are treated as new — at 10^12 docs unbounded
exact-dedup state is not an option). ``foreachBatch`` writes parquet so
the sink is exactly-once per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import content_hash, normalize_text

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "source string, source_order int"
)


def incremental_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    schema: str = PAGES_SCHEMA,
) -> DataFrame:
    """Streaming DataFrame of first-seen pages (exact dups dropped)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    hashed = stream.select(
        "url", "warc_ts", "lang", "source",
        content_hash(normalize_text("text")).alias("content_hash"),
    )
    # dropDuplicatesWithinWatermark evicts state once the watermark passes
    # a key's last-seen event time — plain dropDuplicates([content_hash])
    # would keep every content_hash forever (unbounded state at 10^12
    # docs), and adding warc_ts to the subset would stop deduping at all
    return hashed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def run_to_parquet(
    deduped: DataFrame, out_dir: str, ckpt_dir: str
):
    """Start the exactly-once parquet sink; returns the StreamingQuery."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt_dir)
        .foreachBatch(write_batch)
        .start()
    )
