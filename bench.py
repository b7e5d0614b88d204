#!/usr/bin/env python
"""Benchmark harness (driver contract): prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

Headline = the full dedup pipeline (signatures → bands → pairs →
components → canonical) on a deterministic synthetic pages table scaled
to the sf dir, cold checkpoints, plus the heavyweight contract queries
on the driver tables. docs/sec for the pipeline is included so scaling
runs (local[8] vs local[32], see BENCH/BASELINE.md) can compute
efficiency.

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default all), BENCH_DOCS (override synthetic doc count).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DOCS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 100_000}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    sf = float(sf_name.replace("sf", "")) if sf_name.startswith("sf") else 0.1
    n_docs = int(os.environ.get("BENCH_DOCS", SF_DOCS.get(sf_name, 100_000)))

    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.datagen import GenConfig, generate_pages
    from dedupe_trees_spark.plans.pipeline import DedupePipeline
    from dedupe_trees_spark.session import get_spark
    import dedupe_trees_spark.queries as Q

    # shuffle/spill on tmpfs when available, matching the scaling-run
    # protocol (BENCH/BASELINE.md): the sandbox's single virtual disk
    # adds ±2× run-to-run noise that measures the disk, not the engine
    if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark_local", exist_ok=True)
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark_local"

    spark = get_spark("bench")
    timings: dict[str, float] = {}

    # ---- synthetic pages input (written once per size, reused) ----------
    pages_path = f"/tmp/spark_graft_bench/pages_{n_docs}"
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gcfg = GenConfig(n_docs=n_docs, seed=42)
        generate_pages(spark, gcfg).write.mode("overwrite").parquet(pages_path)

    # ---- headline: full pipeline, cold checkpoints ----------------------
    # JVM/codegen + python-UDF-pool warmup on a tiny input first (same
    # protocol as BENCH/BASELINE.md scaling runs): first evaluation in a
    # fresh JVM measures JIT spin-up, not the engine
    warm_ckpt = f"/tmp/spark_graft_bench/ckpt_warm_{int(time.time()*1000)}"
    warm_pages = "/tmp/spark_graft_bench/pages_warm_2000"
    if not os.path.exists(os.path.join(warm_pages, "_SUCCESS")):
        generate_pages(spark, GenConfig(n_docs=2_000, seed=7)).write.mode(
            "overwrite"
        ).parquet(warm_pages)
    DedupePipeline(
        spark, PipelineConfig(input_path=warm_pages, ckpt_dir=warm_ckpt)
    ).run()
    shutil.rmtree(warm_ckpt, ignore_errors=True)

    ckpt = f"/tmp/spark_graft_bench/ckpt_{n_docs}_{int(time.time()*1000)}"
    cfg = PipelineConfig(input_path=pages_path, ckpt_dir=ckpt, bucket_cap=256)
    t0 = time.time()
    DedupePipeline(spark, cfg).run()
    pipeline_sec = time.time() - t0
    timings["dedup_pipeline"] = round(pipeline_sec, 3)
    shutil.rmtree(ckpt, ignore_errors=True)

    # ---- contract queries on the driver tables --------------------------
    bench_queries = [
        "dedup_canonical_full",
        "minhash_lsh_dup_pairs",
        "substring_dup_pairs",
        "substring_extent_pairs",
        "simhash_dup_pairs",
        "ngram_jaccard_pairs",
        "mod_date_resolution",
        "pricing_summary",
        "sessionize_events",
        "cosine_topk",
        "quality_scores",
        "lang_id",
        "paragraph_dedup_text",
        "repetition_scores",
        "benchmark_contamination",
        "fuzzy_contamination",
        "domain_capped_sample",
        "stratified_sample_stats",
        "html_text_extraction",
        "blocklist_survivors",
        "pii_scrub_stats",
        "gopher_quality_flags",
        "containment_dedup",
        "top_ngrams",
        "outlink_stats",
        "corpus_stats",
        "jaccard_calibration_hist",
        "unigram_logprob_scores",
        "crawl_snapshot_diff",
        "tfidf_keywords",
        "quality_canonical_pick",
        "pack_shards",
        "temperature_resample",
        "hashed_term_features",
        "classifier_scores",
        "span_scrubbed_docs",
        "warc_roundtrip",
        "bpe_token_counts",
        "pack_shards_bpe",
        "temperature_resample_bpe",
        "lang_id_classifier",
    ]
    qs = Q.QUERIES
    for name in bench_queries:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        n = df.count()  # materialize the whole plan
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "dedup_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "pipeline_docs": n_docs,
        "pipeline_docs_per_sec": round(n_docs / pipeline_sec, 1),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "all"),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
