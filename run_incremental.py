#!/usr/bin/env python
"""spark-submit entrypoint for the incremental dedup index
(plans/incremental.py):

    # build the index (one batch-pipeline run + the persisted bucket table)
    spark-submit --py-files dedupe_trees_spark.zip run_incremental.py \
        --init --input /data/crawl_2026_01 --index /ckpt/index

    # fold each later crawl increment in (batch-proportional work)
    spark-submit --py-files dedupe_trees_spark.zip run_incremental.py \
        --input /data/crawl_2026_02 --index /ckpt/index --batch 2026-02

Pipeline flags (--threshold, --bands, --nid-bits, --resolve, ...) are
shared with run_dedupe.py. A completed batch id is a no-op (the batch
marker gates it), and a batch interrupted mid-commit converges when
re-run — see the commit protocol in plans/incremental.py.
"""

from __future__ import annotations

import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    def pop_opt(name, default=None):
        if name in argv:
            i = argv.index(name)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    def pop_flag(name) -> bool:
        if name in argv:
            argv.remove(name)
            return True
        return False

    master = pop_opt("--master")
    index_dir = pop_opt("--index")
    batch_id = pop_opt("--batch")
    do_init = pop_flag("--init")
    if not index_dir:
        print("run_incremental: --index DIR is required", file=sys.stderr)
        return 2
    if not do_init and not batch_id:
        print("run_incremental: --batch ID required unless --init", file=sys.stderr)
        return 2

    from dedupe_trees_spark.config import from_args
    from dedupe_trees_spark.session import get_spark

    cfg = from_args(argv + ["--ckpt", index_dir])
    spark = get_spark("run_incremental", master=master)

    t0 = time.time()
    if do_init:
        from dedupe_trees_spark.plans.incremental import init_index

        report = {"op": "init", "stages": list(init_index(spark, cfg))}
    else:
        from dedupe_trees_spark.plans.incremental import incremental_update
        from dedupe_trees_spark.sources.pages import read_pages_any

        report = {"op": "update"}
        report.update(
            incremental_update(
                spark, cfg, read_pages_any(spark, cfg.input_path), batch_id
            )
        )
    report["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
