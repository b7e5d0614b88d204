"""A/B the pairs-stage map-side bucket build: fused single-posexplode
vs the round-4 four-branch union (round-4 verdict directive #3 — the
map-side build was 63% of the 16 M candidates kernel).

Interleaved noop-write repetitions from a committed S1 checkpoint, same
protocol as tools/pairs_profile.py kernels (tmpfs shuffle, warmup
slice, tuned shuffle partitions).

Usage: python tools/bucket_build_ab.py CKPT [reps] [cores] [heap]
Prints one JSON line with per-rep walls + medians for both shapes and
the full candidates kernel (fused input) for the <250 s @16M check.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ckpt = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cores = sys.argv[3] if len(sys.argv) > 3 else "32"
    heap = sys.argv[4] if len(sys.argv) > 4 else "34g"

    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark_local")
    os.environ["SPARK_GRAFT_CPUS"] = cores
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap

    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.io import read_stage
    from dedupe_trees_spark.operators.lsh import candidate_pairs, explode_bands
    from dedupe_trees_spark.plans.pipeline import (
        DedupePipeline,
        _build_bucket_table_fused,
        build_bucket_table,
    )
    from dedupe_trees_spark.session import get_spark

    spark = get_spark("bucket_ab", master=f"local[{cores}]")
    cfg = PipelineConfig(input_path="unused", ckpt_dir=ckpt)
    pipe = DedupePipeline(spark, cfg)
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    pipe._tune_shuffle_for_pairs(base_parts)
    sigs = read_stage(spark, ckpt, "signatures")

    def union_table(s):
        bands = explode_bands(
            s, sig_col="minhash", id_col="nid",
            bands=cfg.bands, rows=cfg.rows_per_band,
        )
        return build_bucket_table(s, cfg, bands_df=bands)

    def fused_table(s):
        return _build_bucket_table_fused(s, cfg)

    def noop(df) -> float:
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 1)

    # warm both codegen paths
    warm = sigs.limit(50_000)
    noop(union_table(warm))
    noop(fused_table(warm))

    walls = {"union": [], "fused": []}
    for rep in range(reps):
        order = [("union", union_table), ("fused", fused_table)]
        if rep % 2:
            order.reverse()
        for name, fn in order:
            walls[name].append(noop(fn(sigs)))
            print(f"rep {rep+1} {name}: {walls[name][-1]}s", flush=True)

    cands_sec = noop(
        candidate_pairs(
            fused_table(sigs), id_col="nid",
            cap=cfg.bucket_cap, star_srcs=pipe.SRC_EXACT,
        )
    )
    out = {
        "op": "bucket_build_ab", "cores": cores, "heap": heap,
        "walls": walls,
        "union_median": statistics.median(walls["union"]),
        "fused_median": statistics.median(walls["fused"]),
        "candidates_noop_sec_fused": cands_sec,
        "bucket_rows": fused_table(sigs).count(),
    }
    spark.conf.set("spark.sql.shuffle.partitions", base_parts)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
