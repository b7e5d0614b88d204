"""Incremental index parity: delta-batch dedup == full-batch pipeline.

The parity theorem (plans/incremental.py docstring): with resolver keys
that are pure row functions, init_index(batch1) + incremental_update
(batch2) produces the exact canonical relation the batch pipeline
produces over batch1 ∪ batch2 — component labels, ranks, canonicals,
row for row.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.config import PipelineConfig
from dedupe_trees_spark.datagen import GenConfig, generate_pages
from dedupe_trees_spark.io import read_stage
from dedupe_trees_spark.plans.incremental import incremental_update, init_index
from dedupe_trees_spark.plans.pipeline import DedupePipeline


@pytest.fixture(scope="module")
def incr_run(spark, tmp_path_factory):
    """1200 synthetic pages split pseudo-randomly into two batches so
    planted dup clusters span the split; full run vs init+update."""
    root = tmp_path_factory.mktemp("incr")
    all_inp, b1_inp, b2_inp = (str(root / d) for d in ("all", "b1", "b2"))
    ckpt_full, idx_dir = str(root / "ckpt_full"), str(root / "index")
    pages = generate_pages(spark, GenConfig(n_docs=1200, seed=7), partitions=8)
    pages.write.mode("overwrite").parquet(all_inp)
    pages = spark.read.parquet(all_inp)
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).write.parquet(b1_inp)
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).write.parquet(b2_inp)

    DedupePipeline(
        spark, PipelineConfig(input_path=all_inp, ckpt_dir=ckpt_full, bucket_cap=64)
    ).run()
    cfg_idx = PipelineConfig(input_path=b1_inp, ckpt_dir=idx_dir, bucket_cap=64)
    init_index(spark, cfg_idx)
    report = incremental_update(
        spark, cfg_idx, spark.read.parquet(b2_inp), "002"
    )
    return spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report


def test_canonical_parity_with_full_run(incr_run):
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    full = read_stage(spark, ckpt_full, "canonical")
    incr = read_stage(spark, idx_dir, "canonical")
    assert full.count() == incr.count() == 1200
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0


def test_cluster_map_parity(incr_run):
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    full = read_stage(spark, ckpt_full, "components")
    incr = read_stage(spark, idx_dir, "components")
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0


def test_update_report_counts(incr_run):
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    assert report["new_docs"] == spark.read.parquet(b2_inp).count()
    assert report["skipped_existing"] == 0
    assert report["edges"] > 0
    assert report["touched_clusters"] > 0


def test_signature_appends_not_rewrites(incr_run):
    """The batch commit APPENDS prefixed files to signatures/ and
    buckets/ — the init-time files survive untouched."""
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    for stage in ("signatures", "buckets"):
        names = os.listdir(os.path.join(idx_dir, stage))
        assert any(n.startswith("b002-") for n in names), stage
        assert any(
            n.startswith("part-") and n.endswith(".parquet") for n in names
        ), stage


def test_completed_batch_is_noop(incr_run):
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    again = incremental_update(
        spark, cfg_idx, spark.read.parquet(b2_inp), "002"
    )
    assert again.get("skipped") is True


def test_reingest_under_new_batch_id_changes_nothing(incr_run):
    spark, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    before = read_stage(spark, idx_dir, "canonical")
    b_rows = before.count()
    b_canon = before.filter("is_canonical").count()
    rep = incremental_update(
        spark, cfg_idx, spark.read.parquet(b2_inp), "003"
    )
    assert rep["new_docs"] == 0
    assert rep["skipped_existing"] == spark.read.parquet(b2_inp).count()
    after = read_stage(spark, idx_dir, "canonical")
    assert after.count() == b_rows
    assert after.filter("is_canonical").count() == b_canon


def test_cli_init_and_update(incr_run, spark, tmp_path, capsys):
    """run_incremental.py end-to-end: --init then --batch over the same
    two-batch split; the update report reaches stdout as one JSON line."""
    import json

    import run_incremental

    _, cfg_idx, ckpt_full, idx_dir, b2_inp, report = incr_run
    idx = str(tmp_path / "cli_idx")
    rc = run_incremental.main(
        ["--init", "--input", cfg_idx.input_path, "--index", idx]
    )
    assert rc == 0
    rc = run_incremental.main(
        ["--input", b2_inp, "--index", idx, "--batch", "002"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["op"] == "update"
    assert out["new_docs"] == report["new_docs"]
    full = read_stage(spark, ckpt_full, "canonical")
    incr = read_stage(spark, idx, "canonical")
    assert incr.exceptAll(full).count() == 0
    assert full.exceptAll(incr).count() == 0


def test_bridge_doc_merges_two_indexed_clusters(spark, tmp_path):
    """A batch-2 doc near both of two mutually-dissimilar batch-1 docs
    merges their clusters; exactly one old canonical is displaced.

    Token construction: C = c0..c99; A = c0..c91 + 8 private tokens;
    B = c8..c99 + 8 private tokens. Shingle Jaccard: J(A,C) = J(B,C)
    = 90/106 ≈ 0.849 ≥ 0.8, J(A,B) = 82/114 ≈ 0.719 < 0.8 — LSH
    proposes A–B too, but exact verification drops it. simhash and
    substring generators are disabled: both would link A–B directly
    (84 shared contiguous tokens ≫ the 96-char winnow guarantee).
    """
    c = [f"c{i}" for i in range(100)]
    docs = {
        "http://s/a": " ".join(c[:92] + [f"a{i}" for i in range(8)]),
        "http://s/b": " ".join(c[8:] + [f"b{i}" for i in range(8)]),
        "http://s/z": " ".join(f"z{i}" for i in range(100)),
    }
    bridge = {"http://s/c": " ".join(c)}
    b1 = spark.createDataFrame(list(docs.items()), ["url", "text"])
    b2 = spark.createDataFrame(list(bridge.items()), ["url", "text"])
    inp = str(tmp_path / "b1")
    b1.write.parquet(inp)
    cfg = PipelineConfig(
        input_path=inp,
        ckpt_dir=str(tmp_path / "idx"),
        enable_simhash=False,
        enable_substring=False,
        resolvers=("arbitrary",),
    )
    init_index(spark, cfg)
    canon0 = read_stage(spark, cfg.ckpt_dir, "canonical")
    assert canon0.filter("is_canonical").count() == 3  # a, b, z separate

    rep = incremental_update(spark, cfg, b2, "b2")
    assert rep["touched_clusters"] == 2
    assert rep["merged_clusters"] == 1
    assert rep["displaced_old_canonicals"] == 1
    canon = read_stage(spark, cfg.ckpt_dir, "canonical")
    merged = canon.filter(F.col("url") != "http://s/z")
    # a, b, c now share one component; canonical = min url = a
    assert merged.select("component_id").distinct().count() == 1
    survivors = {r.url for r in merged.filter("is_canonical").collect()}
    assert survivors == {"http://s/a"}
