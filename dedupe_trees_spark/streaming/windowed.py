"""Watermarked event-time window aggregation over the events stream
(SURVEY.md §2.9): tumbling-window counts per event type with late-data
handling via watermark.

At web scale this is the ingest-monitoring companion to the dedup
stream: state is bounded because windows older than the watermark are
finalized and dropped; late events beyond the slack are discarded
instead of reopening state. The same logical query runs as a batch
groupBy(window(...)) — that twin is the test oracle
(tests/test_streaming.py), mirroring the engine/oracle contract pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _windowed_counts(df: DataFrame, window: str) -> DataFrame:
    return (
        df.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )


def windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    schema: str = EVENTS_SCHEMA,
) -> DataFrame:
    """Streaming tumbling-window counts per event_type, watermarked."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    return _windowed_counts(stream.withWatermark("ts", watermark), window)


def windowed_event_counts_batch(df: DataFrame, window: str = "10 minutes") -> DataFrame:
    """The batch twin of windowed_event_counts — same plan, no watermark
    (batch sees all data, so no state to bound). Used as the oracle."""
    return _windowed_counts(df, window)
