"""Per-partition lineage manifests + per-stage metrics (BASELINE.json:14).

After each stage commits, we record one row per output file (the
durable unit of partition lineage): file path + exact row count. Row
counts come from the parquet FOOTERS, not a re-scan — the footer is
exact, and re-reading a multi-TB stage output just to count rows would
double every stage's IO (measured ~20% of total wall locally).

The lineage/metrics tables are written with pyarrow DIRECTLY, not
through Spark: they are a handful of rows, and routing them through
createDataFrame + a write job means scheduling two JVM jobs right after
a multi-GB stage write — measured 9–18 s per stage at local[32] (the
young-generation is full of write buffers and the tiny job stalls
behind GC), totalling ~80 s of a 1M-doc run. pyarrow writes the same
parquet files in milliseconds; Spark reads the directories exactly the
same way.
"""

from __future__ import annotations

import glob
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from dedupe_trees_spark.io import stage_path

_LINEAGE_SCHEMA = pa.schema(
    [("file", pa.string()), ("rows", pa.int64()), ("stage", pa.string())]
)
_METRICS_SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("wall_ms", pa.float64()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("n_files", pa.int64()),
        ("finished_at", pa.string()),
    ]
)


def _file_rows(out_dir: str) -> list[tuple[str, int]]:
    files = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    return [(f, pq.read_metadata(f).num_rows) for f in files]


def _append_rows(rows: list[dict], schema: pa.Schema, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet"),
    )


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
    _append_rows(
        [{"file": f, "rows": n, "stage": stage} for f, n in file_rows],
        _LINEAGE_SCHEMA,
        stage_path(ckpt_dir, "_lineage"),
    )
    rows_out = sum(n for _, n in file_rows)
    metrics_row = {
        "stage": stage,
        "wall_ms": float(wall_ms),
        "rows_in": int(rows_in) if rows_in is not None else None,
        "rows_out": int(rows_out),
        "n_files": len(file_rows),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _append_rows([metrics_row], _METRICS_SCHEMA, stage_path(ckpt_dir, "_metrics"))
    return metrics_row
