from __future__ import annotations

import itertools
import shutil

import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.config import PipelineConfig, from_args
from dedupe_trees_spark.datagen import GenConfig, generate_pages
from dedupe_trees_spark.io import stage_done
from dedupe_trees_spark.plans.pipeline import DedupePipeline


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    """One full pipeline run on 1200 synthetic pages, shared by tests."""
    root = tmp_path_factory.mktemp("pipe")
    inp = str(root / "pages")
    ckpt = str(root / "ckpt")
    gcfg = GenConfig(n_docs=1200, seed=42)
    generate_pages(spark, gcfg, partitions=8).write.mode("overwrite").parquet(inp)
    cfg = PipelineConfig(input_path=inp, ckpt_dir=ckpt, bucket_cap=64)
    pipe = DedupePipeline(spark, cfg)
    report = pipe.run()
    return spark, gcfg, cfg, pipe, report, inp, ckpt


def test_all_stages_ran_and_checkpointed(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    for stage in ["signatures", "pairs", "components", "canonical"]:
        assert stage_done(ckpt, stage), stage
        assert not report[stage].get("skipped")
        assert report[stage]["rows_out"] > 0
    # bands are derived inline by default (checkpoint_bands=False)
    assert "bands" not in report and not stage_done(ckpt, "bands")


def test_exact_clusters_fully_merged(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    truth = spark.read.parquet(inp).select("url", "truth_cluster", "truth_kind").toPandas()
    got = pipe.canonical().select("url", "component_id").toPandas()
    comp = dict(zip(got.url, got.component_id))
    # every exact cluster must land in one component (xxhash64 grouping)
    for root, grp in truth[truth.truth_kind == "exact"].groupby("truth_cluster"):
        comps = {comp[u] for u in grp.url}
        assert len(comps) == 1, f"exact cluster {root} split into {comps}"


def test_canonical_one_per_component(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    canon = pipe.canonical()
    per_comp = (
        canon.filter("is_canonical").groupBy("component_id").count().filter("count != 1")
    )
    assert per_comp.count() == 0  # arbitrary terminal → exactly one survivor


def test_dup_pair_recall_vs_bruteforce(pipeline_run):
    """north_rule: dup-pair recall ≥ 0.99 at the same shingle config.

    Truth = brute-force pairs with shingle-Jaccard ≥ threshold (near dups)
    ∪ byte-identical pairs (exact). Engine pairs = same-component pairs.
    """
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    pdf = spark.read.parquet(inp).select("url", "text").toPandas()

    def sh(t, k=cfg.shingle_k):
        x = t.split()
        return set(tuple(x[i : i + k]) for i in range(max(len(x) - k + 1, 1)))

    S = {r.url: sh(r.text.lower()) for r in pdf.itertuples()}
    urls = sorted(S)
    truth_pairs = set()
    for a, b in itertools.combinations(urls, 2):
        sa, sb = S[a], S[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= cfg.jaccard_threshold:
            truth_pairs.add((a, b))
    assert truth_pairs

    got = pipe.canonical().select("url", "component_id").toPandas()
    by_comp = {}
    for u, c in zip(got.url, got.component_id):
        by_comp.setdefault(c, []).append(u)
    engine_pairs = set()
    for members in by_comp.values():
        for a, b in itertools.combinations(sorted(members), 2):
            engine_pairs.add((a, b))
    missed = truth_pairs - engine_pairs
    recall = 1 - len(missed) / len(truth_pairs)
    assert recall >= 0.99, f"recall={recall}, missed={list(missed)[:5]}"


def test_substr_clusters_connected(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    truth = spark.read.parquet(inp).select("url", "truth_cluster", "truth_kind").toPandas()
    got = pipe.canonical().select("url", "component_id").toPandas()
    comp = dict(zip(got.url, got.component_id))
    for root, grp in truth[truth.truth_kind == "substr"].groupby("truth_cluster"):
        comps = {comp[u] for u in grp.url}
        assert len(comps) == 1, f"substr cluster {root} split into {comps}"


def test_lineage_and_metrics_written(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    lineage = spark.read.parquet(f"{ckpt}/_lineage")
    metrics = spark.read.parquet(f"{ckpt}/_metrics")
    stages = {r["stage"] for r in metrics.select("stage").distinct().collect()}
    assert {"signatures", "pairs", "components", "canonical"} <= stages
    # lineage: per-file row counts sum to stage totals
    sig_rows = (
        lineage.filter("stage = 'signatures'").agg(F.sum("rows")).collect()[0][0]
    )
    assert sig_rows == 1200


def test_resume_skips_done_stages_and_is_identical(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    before = sorted(
        (r["url"], r["component_id"], r["is_canonical"])
        for r in pipe.canonical().collect()
    )
    # simulate a crash after S2: wipe pairs/components/canonical
    for stage in ["pairs", "components", "canonical"]:
        shutil.rmtree(f"{ckpt}/{stage}")
    pipe2 = DedupePipeline(spark, cfg)
    report2 = pipe2.run()
    assert report2["signatures"].get("skipped")
    assert not report2["pairs"].get("skipped")
    after = sorted(
        (r["url"], r["component_id"], r["is_canonical"])
        for r in pipe2.canonical().collect()
    )
    assert before == after


def test_deduped_pages_sink(pipeline_run):
    spark, gcfg, cfg, pipe, report, inp, ckpt = pipeline_run
    n_in = spark.read.parquet(inp).count()
    n_removed = pipe.removals().count()
    n_kept = pipe.deduped_pages().count()
    assert n_kept == n_in - n_removed
    assert n_removed > 0


def test_checkpoint_bands_flag_restores_band_stage(spark, tmp_path):
    """checkpoint_bands=True materializes + resumes the band table."""
    inp = str(tmp_path / "pages")
    generate_pages(spark, GenConfig(n_docs=300, seed=13), partitions=4).write.mode(
        "overwrite"
    ).parquet(inp)
    cfg = PipelineConfig(
        input_path=inp, ckpt_dir=str(tmp_path / "ckpt"),
        bucket_cap=64, checkpoint_bands=True,
    )
    report = DedupePipeline(spark, cfg).run()
    assert stage_done(cfg.ckpt_dir, "bands") and report["bands"]["rows_out"] > 0
    report2 = DedupePipeline(spark, cfg).run()
    assert report2["bands"].get("skipped")


def test_no_cached_rdds_leak_from_pipeline_run(spark, tmp_path):
    """Cache hygiene: a full pipeline run must leave nothing persisted —
    long-lived drivers loop over runs, so every cached band table would
    accumulate executor memory forever."""
    inp = str(tmp_path / "pages")
    generate_pages(spark, GenConfig(n_docs=300, seed=11), partitions=4).write.mode(
        "overwrite"
    ).parquet(inp)
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    cfg = PipelineConfig(input_path=inp, ckpt_dir=str(tmp_path / "ckpt"), bucket_cap=64)
    DedupePipeline(spark, cfg).run()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"pipeline leaked cached RDDs: {after - before}"


def test_config_from_args():
    cfg = from_args(
        [
            "--input", "/x", "--ckpt", "/y", "--threshold", "0.7",
            "--no-simhash", "--resolve", "mod_date,arbitrary", "--bucket-cap", "99",
        ]
    )
    assert cfg.input_path == "/x" and cfg.ckpt_dir == "/y"
    assert cfg.jaccard_threshold == 0.7
    assert not cfg.enable_simhash and cfg.enable_minhash
    assert cfg.resolvers == ("mod_date", "arbitrary")
    assert cfg.bucket_cap == 99
