"""Streaming NEAR-duplicate dedup: micro-batches fold into the
persistent incremental index.

``dedup_stream`` handles exact dups with watermarked in-flight state;
near-dup needs candidate generation against everything seen so far,
and that state at 10^12 docs is the bucket index (~75 rows/doc) — far
beyond any streaming state store, and a single-key
``dropDuplicatesWithinWatermark`` trick caps recall at one band's
match probability (J^rows_per_band per key). So the streaming form is
``foreachBatch`` + ``plans.incremental.incremental_update``: every
micro-batch gets the full four-generator candidate semantics (exact ∪
MinHash-LSH ∪ SimHash ∪ winnowed-substring) against the on-disk index,
with batch-proportional work and no corpus-sized shuffle (the
incremental module's join discipline).

Exactly-once: Structured Streaming replays a failed epoch under the
SAME epoch id, and ``incremental_update`` is idempotent per batch id
(prefix-named appends + a batch marker that no-ops replays), so a
crash between the index commit and the stream checkpoint advances
cannot double-apply a batch.

Parity: once the stream drains, the index's canonical table equals the
batch pipeline run over everything ingested — the incremental parity
theorem, re-asserted end-to-end through this glue in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dedupe_trees_spark.config import PipelineConfig
from dedupe_trees_spark.plans.incremental import incremental_update
from dedupe_trees_spark.streaming.dedup_stream import PAGES_SCHEMA


def neardup_index_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig,
    schema: str = PAGES_SCHEMA,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
):
    """Start the stream: pages files under ``input_dir`` fold into the
    dedup index at ``cfg.ckpt_dir`` (built by ``init_index``) one
    micro-batch at a time. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        incremental_update(spark, cfg, batch_df, f"e{epoch_id:06d}")

    ckpt = checkpoint_dir or f"{cfg.ckpt_dir}/_stream_ckpt"
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(fold)
        .start()
    )
