"""Catalog/storage seam: parquet in-sandbox, Iceberg behind the same API.

SURVEY.md §7: no Iceberg runtime jar ships in this sandbox (verified),
so the catalog access is isolated here — `iceberg:<table>` inputs flip
to ``spark.table`` when a catalog is configured, everything else is
parquet directories. Stage checkpoints are plain parquet writes whose
``_SUCCESS`` marker doubles as the resume gate (BASELINE.json:14
checkpointed resumability).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Input table of Common-Crawl-style pages (BASELINE.json input_hint)."""
    if path.startswith("iceberg:"):
        return spark.table(path.split(":", 1)[1])
    return spark.read.parquet(path)


def stage_path(ckpt_dir: str, stage: str) -> str:
    return os.path.join(ckpt_dir, stage)


def stage_done(ckpt_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(stage_path(ckpt_dir, stage), "_SUCCESS"))


def write_stage(df: DataFrame, ckpt_dir: str, stage: str) -> None:
    df.write.mode("overwrite").parquet(stage_path(ckpt_dir, stage))


def read_stage(spark: SparkSession, ckpt_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(stage_path(ckpt_dir, stage))


def remove_dir(spark: SparkSession, path: str) -> None:
    """Recursively delete a directory through the Hadoop FileSystem API —
    works for any checkpoint filesystem (local, HDFS, S3A), unlike
    shutil. Used to drop per-run scratch intermediates once the stage
    that consumed them has committed."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        fs.delete(p, True)
