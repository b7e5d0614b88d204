#!/usr/bin/env python
"""spark-submit entrypoint (BASELINE.json north_star):

    spark-submit --py-files dedupe_trees_spark.zip run_dedupe.py \
        --input /data/pages_parquet --ckpt /ckpt/run1 \
        --resolve source_order,path_depth,copy_pattern,mod_date,arbitrary

Also runnable as plain ``python run_dedupe.py`` locally (builds its own
local[N] session). Resumes from the newest complete stage checkpoint
unless --no-resume. Add --gen-docs N to deterministically synthesize
the input first (no external data).
"""

from __future__ import annotations

import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    # --gen-docs / --master / --seed are entrypoint-level, not pipeline config
    def pop_opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    gen_docs = pop_opt("--gen-docs")
    master = pop_opt("--master")
    seed = int(pop_opt("--seed", "42"))
    sequester_dir = pop_opt("--sequester")   # R12 sink: removals moved aside
    manifest_dir = pop_opt("--manifest")     # R13 sink: removal list (csv)
    training_out = pop_opt("--training-out") # S6 sink: exported training set
    out_format = pop_opt("--out-format", "parquet")  # parquet|jsonl|jsonl.gz|warc
    out_shards = pop_opt("--out-shards")     # fixed part-file count for the sink
    warmup = "--warmup" in argv
    if warmup:
        argv.remove("--warmup")

    from dedupe_trees_spark.config import from_args
    from dedupe_trees_spark.session import get_spark

    cfg = from_args(argv)
    spark = get_spark("run_dedupe", master=master)

    if gen_docs:
        from dataclasses import replace as _replace

        from dedupe_trees_spark.datagen import GenConfig, generate_pages

        gcfg = GenConfig(n_docs=int(gen_docs), seed=seed)
        generate_pages(spark, gcfg).write.mode("overwrite").parquet(cfg.input_path)
        # the input was just regenerated — stale stage checkpoints would
        # silently report results computed from the PREVIOUS input
        cfg = _replace(cfg, resume=False)

    from dedupe_trees_spark.plans.pipeline import DedupePipeline

    if warmup:
        # benchmark mode: run the whole pipeline once on a tiny synthetic
        # input so JIT/codegen + the Python UDF worker pool are warm before
        # the timed section (first evaluation in a fresh JVM measured 2-3×
        # slower than steady state)
        import shutil
        import tempfile

        from dedupe_trees_spark.datagen import GenConfig, generate_pages
        from dedupe_trees_spark.config import PipelineConfig as _PC
        from dataclasses import replace

        wdir = tempfile.mkdtemp(prefix="dedupe_warmup_")
        generate_pages(spark, GenConfig(n_docs=20_000, seed=7)).write.mode(
            "overwrite"
        ).parquet(f"{wdir}/pages")
        DedupePipeline(
            spark,
            replace(cfg, input_path=f"{wdir}/pages", ckpt_dir=f"{wdir}/ckpt"),
        ).run()
        shutil.rmtree(wdir, ignore_errors=True)

    t0 = time.time()
    pipe = DedupePipeline(spark, cfg)
    report = pipe.run()
    wall = time.time() - t0

    if sequester_dir or manifest_dir:
        from dedupe_trees_spark.io import read_pages
        from dedupe_trees_spark.operators.resolve import (
            apply_sequester_sink,
            write_manifest,
        )

        removed = pipe.removals()
        if sequester_dir:
            apply_sequester_sink(read_pages(spark, cfg.input_path), removed, sequester_dir)
        if manifest_dir:
            write_manifest(removed, manifest_dir)

    if training_out:
        # publish the shaped corpus (or plain deduped pages when no
        # shaping flag is set) outside the checkpoint dir, in the
        # requested layout: parquet (default), jsonl[.gz] (the common
        # LLM-training shard format; `html` binaries serialize as
        # base64), or warc (re-archive via write_pages_warc).
        # --out-shards N fixes the part-file count by repartitioning on
        # xxhash64(url) — deterministic file contents at any input
        # parallelism, unlike round-robin coalesce.
        out = (
            pipe.training_set()
            if "training_set" in report
            else pipe.deduped_pages()
        )
        n_shards = int(out_shards) if out_shards else None
        if out_format == "warc":
            from dedupe_trees_spark.sources.warc import write_pages_warc

            write_pages_warc(out, training_out, files=n_shards).collect()
        elif out_format in ("parquet", "jsonl", "jsonl.gz"):
            if n_shards:
                out = out.repartition(n_shards, out["url"])
            w = out.write.mode("overwrite")
            if out_format == "parquet":
                w.parquet(training_out)
            else:
                if out_format == "jsonl.gz":
                    w = w.option("compression", "gzip")
                w.json(training_out)
        else:
            raise ValueError(
                f"--out-format {out_format!r}: expected parquet, jsonl, "
                "jsonl.gz, or warc"
            )

    canon = pipe.canonical()
    n_total = canon.count()
    n_kept = canon.filter("is_canonical").count()
    summary = {
        "wall_sec": round(wall, 2),
        "docs": n_total,
        "kept": n_kept,
        "removed": n_total - n_kept,
        "docs_per_sec": round(n_total / wall, 1) if wall > 0 else None,
        "stages": {
            k: ({"skipped": True} if v.get("skipped") else {
                "wall_ms": round(v["wall_ms"], 1),
                "rows_out": v["rows_out"],
                "n_files": v["n_files"],
                **({"phases": v["phases"]} if "phases" in v else {}),
            })
            for k, v in report.items()
        },
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
