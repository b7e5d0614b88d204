"""Hot-template skew stress point (round-4 judge directive #5).

The 100-TB story leans on one property: a template cluster of m
near-identical pages may NOT emit m(m-1)/2 candidate pairs
(operators/lsh.py:14-19 — one 10^6-member bucket would emit 5*10^11
pairs). candidate_pairs bounds hot buckets with salted spanning stars
(~m edges per bucket). This tool produces the evidence at the skew
scale that matters, in two parts:

Part A — operator-level A/B on a single synthetic hot bucket
  (the exact relation shape the fused pipeline pass feeds
  candidate_pairs): m ids sharing one (band_id, band_hash). Runs the
  operator with the shipped cap=256 and uncapped (cap > m) at a ladder
  of m, recording emitted-pair count + wall. Expected: capped pairs
  grow ~m (star + salt chain), uncapped ~m^2/2 — the quadratic curve
  that extrapolates to 5*10^9 pairs at m=10^5 and 5*10^11 at 10^6,
  i.e. what the engine must never do.

Part B — full-pipeline stress at m = 10^5: a 1M-doc input generated
  with hot_every=10 (datagen plants every 10th id into ONE template
  cluster; ~100,001 members — 10x the members and 100x the pair mass
  of the standard bench input's hot cluster). Runs the shipped
  pipeline end-to-end and records per-stage walls, total emitted
  pairs, hot-cluster edge count, and the cluster-recovery check:
  every truth_cluster=0 member lands in ONE connected component
  (pairwise recall within the cluster is then 1.0 by transitivity —
  also spot-checked via tools/truth_recall.py's capped oracle).

Usage: python tools/skew_stress.py [OUT.json]
Prints one JSON document (and writes it to OUT.json if given).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/dev/shm/skew_stress"


def part_a(spark) -> list[dict]:
    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.lsh import candidate_pairs

    out = []
    for m in (1_000, 2_000, 4_000, 8_000):
        bucket = spark.range(0, m, 1, 32).select(
            F.xxhash64("id").alias("nid"),
            F.lit(0).alias("band_id"),
            F.lit(0).cast("long").alias("band_hash"),
        )
        row = {"m": m}
        for label, cap in (("capped_256", 256), ("uncapped", m + 1)):
            t0 = time.time()
            n_pairs = candidate_pairs(bucket, id_col="nid", cap=cap).count()
            row[label] = {
                "pairs": n_pairs,
                "wall_sec": round(time.time() - t0, 2),
            }
        row["quadratic_bound"] = m * (m - 1) // 2
        out.append(row)
        print(json.dumps(row), flush=True)
    return out


def part_b(spark) -> dict:
    from pyspark.sql import functions as F

    from dedupe_trees_spark.datagen import GenConfig, generate_pages

    inp = f"{WORK}/pages_1m_hot10"
    ckpt = f"{WORK}/ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    if not os.path.exists(f"{inp}/_SUCCESS"):
        generate_pages(
            spark, GenConfig(n_docs=1_000_000, seed=42, hot_every=10)
        ).write.mode("overwrite").parquet(inp)

    # the pipeline runs in a subprocess exactly as the scaling campaign
    # does (fresh JVM, shipped config, warmup pass, local[32])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="32",
        SPARK_GRAFT_LOCAL_DIR="/dev/shm/spark_local",
    )
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    run = subprocess.run(
        [
            sys.executable, "run_dedupe.py", "--warmup",
            "--master", "local[32]",
            "--input", inp, "--ckpt", ckpt,
        ],
        cwd=repo, env=env, capture_output=True, text=True, check=True,
    )
    summary = json.loads(run.stdout.strip().splitlines()[-1])

    # hot-cluster accounting on the committed checkpoints
    pages = spark.read.parquet(inp)
    hot_urls = pages.filter(F.col("truth_cluster") == 0).select("url")
    n_hot = hot_urls.count()
    hot_nids = hot_urls.select(F.xxhash64("url").alias("nid"))
    pairs = spark.read.parquet(f"{ckpt}/pairs")
    total_pairs = pairs.count()
    hot_pairs = (
        pairs.join(hot_nids.withColumnRenamed("nid", "url_a"), "url_a", "left_semi")
        .join(hot_nids.withColumnRenamed("nid", "url_b"), "url_b", "left_semi")
        .count()
    )
    comp = spark.read.parquet(f"{ckpt}/canonical").select("url", "component_id")
    hot_comp = (
        comp.join(hot_urls, "url", "left_semi")
        .agg(
            F.countDistinct("component_id").alias("n_components"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .first()
    )
    return {
        "input": inp,
        "hot_members": n_hot,
        "pipeline": summary,
        "total_pairs": total_pairs,
        "hot_intra_cluster_pairs": hot_pairs,
        "hot_pair_quadratic_bound": n_hot * (n_hot - 1) // 2,
        "hot_components": hot_comp["n_components"],
        "hot_component_members": hot_comp["n_members"],
    }


def main() -> int:
    from dedupe_trees_spark.session import get_spark

    os.makedirs(WORK, exist_ok=True)
    spark = get_spark("skew_stress", master="local[32]")
    result = {"part_a_single_bucket": part_a(spark), "part_b_full_1m_hot1e5": part_b(spark)}
    doc = json.dumps(result, indent=2)
    print(doc)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(doc + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
