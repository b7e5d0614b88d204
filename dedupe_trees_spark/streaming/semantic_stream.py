"""Streaming SEMANTIC dedup: embedding micro-batches fold into the
persistent embedding index — the embedding twin of
``streaming/neardup_stream.py``.

Candidate generation against everything seen so far needs the SRP
bucket table (n_tables rows/vector), which at 10^12 vectors lives on
disk, not in a streaming state store. So the streaming form is
``foreachBatch`` + ``plans.embedding_index.update_embedding_index``:
each micro-batch gets the full bucket-probe + exact-cosine-verify + CC
semantics against the on-disk index with batch-proportional work.

Exactly-once: Structured Streaming replays a failed epoch under the
SAME epoch id, and ``update_embedding_index`` is idempotent per batch
id (staged commit + append-only batch marker), so a crash between the
index commit and the stream checkpoint advance cannot double-apply.

Parity: when the stream drains, the index's cluster labels equal
``init_embedding_index`` over everything ingested — the embedding
parity theorem, re-asserted through this glue in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dedupe_trees_spark.plans.embedding_index import update_embedding_index

VECTORS_SCHEMA = "vec_id long, embedding array<double>"


def semantic_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    schema: str = VECTORS_SCHEMA,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
    tau: float = 0.9,
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
):
    """Start the stream: (vec_id, embedding) parquet files under
    ``input_dir`` fold into the embedding index at ``index_dir`` (built
    by ``init_embedding_index`` with the SAME config) one micro-batch
    at a time. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        update_embedding_index(
            spark, batch_df, index_dir, f"e{epoch_id:06d}",
            tau=tau, dim=dim, n_bits=n_bits, n_tables=n_tables, seed=seed,
        )

    ckpt = checkpoint_dir or f"{index_dir}/_stream_ckpt"
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(fold)
        .start()
    )
