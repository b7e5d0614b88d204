"""Incremental-index benchmark: fold a crawl increment into an existing
index and compare against the cost of a from-scratch re-run.

The headline claim of plans/incremental.py is that an update's cost is
batch-proportional (plus touched-cluster mass and the copy-on-write map
rewrites), never corpus-proportional. This tool measures it against the
16M-doc checkpoint the capacity runs leave behind:

  gen-batch N START OUT [seed]  — synthesize "the next N docs" of the
                                  same deterministic corpus (id_start —
                                  the hot template cluster spans index
                                  and batch, so the capped hot-key path
                                  is exercised for real)
  init INDEX_CKPT [CORES] [HEAP]       — ensure the bucket table exists
                                  over a COMMITTED pipeline ckpt (all
                                  pipeline stages resume as no-ops; the
                                  one real cost is the bucket-table
                                  build+write, reported separately)
  update INDEX_CKPT BATCH BATCH_ID [CORES] [HEAP]
                                  — run incremental_update, print its
                                  report (per-phase walls + counts)

Each command prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _session(cores: str, heap: str):
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    os.environ.update(
        SPARK_GRAFT_CPUS=cores,
        SPARK_GRAFT_LOCAL_DIR="/dev/shm/spark_local",
        SPARK_GRAFT_DRIVER_MEM=heap,
    )
    from dedupe_trees_spark.session import get_spark

    return get_spark("incremental_bench", master=f"local[{cores}]")


def cmd_gen_batch(n: int, start: int, out: str, seed: int = 42) -> dict:
    from dedupe_trees_spark.datagen import GenConfig, generate_pages

    spark = _session("32", "8g")
    t0 = time.time()
    generate_pages(
        spark, GenConfig(n_docs=n, seed=seed, id_start=start)
    ).write.mode("overwrite").parquet(out)
    return {
        "op": "gen-batch", "n_docs": n, "id_start": start, "out": out,
        "wall_sec": round(time.time() - t0, 1),
    }


def cmd_init(ckpt: str, cores: str, heap: str) -> dict:
    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.io import stage_done
    from dedupe_trees_spark.plans.incremental import BUCKETS, init_index

    spark = _session(cores, heap)
    cfg = PipelineConfig(input_path="unused", ckpt_dir=ckpt)
    had_buckets = stage_done(ckpt, BUCKETS)
    t0 = time.time()
    init_index(spark, cfg)
    return {
        "op": "init", "ckpt": ckpt, "buckets_existed": had_buckets,
        "bucket_build_sec": round(time.time() - t0, 1),
    }


def cmd_update(ckpt: str, batch: str, batch_id: str, cores: str, heap: str) -> dict:
    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.plans.incremental import incremental_update

    spark = _session(cores, heap)
    cfg = PipelineConfig(input_path=batch, ckpt_dir=ckpt)
    report = incremental_update(
        spark, cfg, spark.read.parquet(batch), batch_id
    )
    return {"op": "update", "ckpt": ckpt, "batch": batch, **report}


def main() -> int:
    a = sys.argv[1:]
    if a[0] == "gen-batch":
        out = cmd_gen_batch(int(a[1]), int(a[2]), a[3], int(a[4]) if len(a) > 4 else 42)
    elif a[0] == "init":
        out = cmd_init(a[1], a[2] if len(a) > 2 else "32", a[3] if len(a) > 3 else "24g")
    elif a[0] == "update":
        out = cmd_update(
            a[1], a[2], a[3],
            a[4] if len(a) > 4 else "32", a[5] if len(a) > 5 else "24g",
        )
    else:
        print(__doc__)
        return 2
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
