"""Training-shard packing: assign documents to ~fixed-token shards.

The last step of a training-data export is laying the kept corpus out
as shards of roughly equal token budget (data loaders want ~N-token
files; sequential doc order inside a shard preserves locality for
curriculum/source grouping). Reference parity: dedupe_trees stops at
duplicate resolution (SURVEY.md §2.1) — shard layout is part of the
mandated training-pipeline superset.

Semantics: documents are taken in ``id_col`` order; doc i's exclusive
prefix token sum ``cum_before`` determines its shard:
``shard_id = cum_before div target_tokens``. Documents are never
split, so each shard holds ≥ target tokens except possibly the last
(first doc crossing a boundary belongs to the earlier shard's
successor — boundaries land between docs, at identical places for any
partitioning).

The textbook formulation is a global running sum::

    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)

whose physical plan is ``Exchange SinglePartition`` — every row of a
10^12-doc corpus through ONE task. ``pack_shards`` computes the same
integer prefix sum with the classic two-phase distributed scan
instead:

1. range-partition + sort the slim (id, n_tokens) projection on
   ``id_col`` (one exchange, P-way, carrying ~16 bytes/doc);
2. freeze that layout with ``localCheckpoint`` and aggregate one
   (partition, sum) row per partition — P rows to the driver, the
   same O(P)-not-O(n) collect budget as connected components'
   convergence probe;
3. exclusive-prefix the P sums on the driver (range partition k holds
   keys strictly below partition k+1's, so partition order IS key
   order) and broadcast the offsets;
4. one ``mapInPandas`` pass adds offset + NumPy ``cumsum`` per batch —
   Arrow-vectorized, order-preserving, zero additional exchange.

The checkpoint in step 2 is what makes steps 2 and 4 see the *same*
partitioning: ``repartitionByRange`` samples its boundaries, so
re-evaluating the lineage could legally re-draw them. localCheckpoint
materializes the blocks; if an executor holding blocks dies the job
fails loudly instead of silently recomputing with mismatched offsets.
On a real cluster deployment, write the ranged stage to the reliable
``ckpt_dir`` (io.write_stage) instead — the pipeline's stage
convention — and read it back for both passes.

All arithmetic is int64 (token counts are exact), so the assignment
is bit-identical at any partition count and equals the window twin /
DuckDB oracle row-for-row. ``pack_shards_window`` is that twin: oracle
only, single-partition by construction, never for production.

Fat-payload rule (docs/SCALE.md): only (id, n_tokens) rides the range
exchange; callers attach text/html by joining the returned assignment
back on ``id_col``, or — for the common "write the shards" case — by
repartitioning the payload table on the returned ``shard_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dedupe_trees_spark.operators.textstats import token_count


def pack_shards(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    num_parts: int | None = None,
) -> DataFrame:
    """Distributed shard assignment: (id, n_tokens, cum_before, shard_id).

    ``token_col`` supplies precomputed counts; otherwise whitespace
    ``token_count(text_col)`` is used. ``num_parts`` defaults to the
    session's shuffle partitions. Returned ``cum_before`` is the
    exclusive global prefix sum in ``id_col`` order — exposed because
    it is the invariant tests and resumable writers care about.
    """
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be positive, got {target_tokens}")
    spark = df.sparkSession
    if token_col is not None:
        slim = df.select(id_col, F.col(token_col).cast("long").alias("n_tokens"))
    else:
        slim = df.select(id_col, token_count(text_col).cast("long").alias("n_tokens"))
    p = num_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))

    from dedupe_trees_spark.io import local_ckpt

    ranged = (
        slim.repartitionByRange(p, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged, _handles = local_ckpt(ranged)  # freeze sampled range boundaries

    psums = {
        r["_pid"]: r["s"]
        for r in ranged.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(psums):  # range partition order == key order
        offsets[pid] = running
        running += psums[pid]
    bc = spark.sparkContext.broadcast(offsets)
    target = int(target_tokens)

    out_schema = StructType(
        [f for f in ranged.schema.fields if f.name != "_pid"]
        + [
            StructField("cum_before", LongType(), False),
            StructField("shard_id", LongType(), False),
        ]
    )

    def assign(batches):
        running = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pids = pdf["_pid"].unique()
            assert len(pids) == 1, f"mixed partition ids in one task: {pids}"
            if running is None:
                running = bc.value[int(pids[0])]
            toks = pdf["n_tokens"].to_numpy(dtype="int64")
            cs = toks.cumsum()
            out = pdf.drop(columns=["_pid"]).copy()
            out["cum_before"] = running + (cs - toks)
            out["shard_id"] = out["cum_before"] // target
            running += int(cs[-1])
            yield out

    return ranged.mapInPandas(assign, out_schema)


def pack_shards_window(
    df: DataFrame,
    target_tokens: int,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Textbook global-window formulation — the equivalence oracle for
    ``pack_shards``. NOT for production: its plan is Exchange
    SinglePartition (the whole corpus through one task)."""
    from pyspark.sql import Window

    if token_col is not None:
        slim = df.select(id_col, F.col(token_col).cast("long").alias("n_tokens"))
    else:
        slim = df.select(id_col, token_count(text_col).cast("long").alias("n_tokens"))
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, 0)
    cum_before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("cum_before")
    return slim.select(id_col, "n_tokens", cum_before).withColumn(
        "shard_id", F.expr(f"cum_before div {int(target_tokens)}")
    )
