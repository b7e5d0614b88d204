from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.datagen import GenConfig, generate_pages
from dedupe_trees_spark.operators.resolve import (
    apply_sequester_sink,
    write_manifest,
)


def test_byte_identical_text_invariant(spark):
    """BASELINE.json input_hint: byte-identical extracted text per url —
    the text column must be exactly the html payload minus the wrapper,
    for every row, after a full write/read round trip."""
    cfg = GenConfig(n_docs=400, seed=42)
    generate_pages(spark, cfg, partitions=4).write.mode("overwrite").parquet(
        "/tmp/invariant_pages"
    )
    pages = spark.read.parquet("/tmp/invariant_pages")
    extracted = F.decode(
        F.expr("substring(html, 13, length(html) - 26)"), "utf-8"
    )
    bad = pages.filter(extracted != F.col("text")).count()
    assert bad == 0
    # and the content hash of the text equals the hash of the extraction
    bad2 = pages.filter(F.xxhash64(extracted) != F.xxhash64("text")).count()
    assert bad2 == 0


def test_sequester_sink_partitions_by_source(spark, tmp_path):
    rows = [
        ("u1", "keep", "src0"),
        ("u2", "remove", "src0"),
        ("u3", "remove", "src1"),
    ]
    pages = spark.createDataFrame(rows, ["url", "text", "source"])
    removed = spark.createDataFrame([("u2",), ("u3",)], ["url"])
    dest = str(tmp_path / "sequestered")
    apply_sequester_sink(pages, removed, dest)
    back = spark.read.parquet(dest)
    assert sorted(r["url"] for r in back.collect()) == ["u2", "u3"]
    # partition dirs preserved per source (the relative-path analogue)
    import os

    assert any(d.startswith("source=") for d in os.listdir(dest))


def test_write_manifest_csv(spark, tmp_path):
    removed = spark.createDataFrame([("u9",), ("u8",)], ["url"])
    dest = str(tmp_path / "manifest")
    write_manifest(removed, dest)
    out = spark.read.csv(dest).collect()
    assert sorted(r["_c0"] for r in out) == ["u8", "u9"]
