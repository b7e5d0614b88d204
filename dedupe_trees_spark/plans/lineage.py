"""Per-partition lineage manifests + per-stage metrics (BASELINE.json:14).

After each stage commits, we record one row per output file (the
durable unit of partition lineage): file path + exact row count. Row
counts come from the parquet FOOTERS, not a re-scan — the footer is
exact, and re-reading a multi-TB stage output just to count rows would
double every stage's IO (measured ~20% of total wall locally). Stage
wall time and row totals land in a metrics table. Both live under the
checkpoint dir so a resumed run appends to the same history.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from dedupe_trees_spark.io import stage_path


def _file_rows(out_dir: str) -> list[tuple[str, int]]:
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return [(f, pq.read_metadata(f).num_rows) for f in files]


def record_stage(
    spark: SparkSession,
    ckpt_dir: str,
    stage: str,
    wall_ms: float,
    rows_in: int | None = None,
) -> dict:
    """Write lineage (per output file) + metrics (per stage) tables."""
    out = stage_path(ckpt_dir, stage)
    file_rows = _file_rows(out)
    lineage = spark.createDataFrame(
        [(f, n, stage) for f, n in file_rows],
        "file string, rows long, stage string",
    )
    lineage.coalesce(1).write.mode("append").parquet(stage_path(ckpt_dir, "_lineage"))
    rows_out = sum(n for _, n in file_rows)
    metrics_row = {
        "stage": stage,
        "wall_ms": float(wall_ms),
        "rows_in": int(rows_in) if rows_in is not None else None,
        "rows_out": int(rows_out),
        "n_files": len(file_rows),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    spark.createDataFrame(
        [metrics_row],
        "stage string, wall_ms double, rows_in long, rows_out long, n_files long, finished_at string",
    ).coalesce(1).write.mode("append").parquet(stage_path(ckpt_dir, "_metrics"))
    return metrics_row
