"""Per-partition lineage manifests + per-stage metrics (BASELINE.json:14).

After each stage commits, we read the written files back and record one
row per output file (the durable unit of partition lineage): file path,
row count. Stage-level wall time and row totals land in a metrics table.
Both live under the checkpoint dir so a resumed run appends to the same
history.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from dedupe_trees_spark.io import stage_path


def record_stage(
    spark: SparkSession,
    ckpt_dir: str,
    stage: str,
    wall_ms: float,
    rows_in: int | None = None,
) -> dict:
    """Write lineage (per output file) + metrics (per stage) tables."""
    out = stage_path(ckpt_dir, stage)
    df = spark.read.parquet(out)
    lineage = (
        df.select(F.col("_metadata.file_path").alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows"))
        .withColumn("stage", F.lit(stage))
    )
    lineage.write.mode("append").parquet(stage_path(ckpt_dir, "_lineage"))
    totals = lineage.agg(
        F.sum("rows").alias("rows_out"), F.count(F.lit(1)).alias("n_files")
    ).collect()[0]
    metrics_row = {
        "stage": stage,
        "wall_ms": float(wall_ms),
        "rows_in": int(rows_in) if rows_in is not None else None,
        "rows_out": int(totals["rows_out"] or 0),
        "n_files": int(totals["n_files"]),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    spark.createDataFrame(
        [metrics_row],
        "stage string, wall_ms double, rows_in long, rows_out long, n_files long, finished_at string",
    ).write.mode("append").parquet(stage_path(ckpt_dir, "_metrics"))
    return metrics_row
