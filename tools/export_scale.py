"""Scale + N→4N evidence for the export-layout operators.

Times the round-4-late export steps end-to-end over a large pages
input at a given core count, materialized through aggregates that
also serve as cross-core-count determinism checksums:

1. pack_shards — global prefix-sum shard assignment via the two-phase
   distributed scan (range exchange over slim rows, P-row driver
   prefix, mapInPandas cumsum). The checksum covers every
   (url, shard_id) pair, so a partition-boundary bug can't hide.
2. temperature_resample — counts^alpha language rebalancing
   (|strata|-row agg + broadcast fraction filter; corpus never
   shuffled). Checksum covers the exact kept row set.

Usage: python tools/export_scale.py [pages_parquet] [cores] [OUT.json]
Prints one JSON document (and writes OUT.json if given).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_4m_r4"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.domains import temperature_resample
    from dedupe_trees_spark.operators.shards import pack_shards
    from dedupe_trees_spark.session import get_spark

    os.makedirs("/dev/shm/export_tmp", exist_ok=True)
    spark = get_spark(
        app_name="export_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/export_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "text", "lang")
    res: dict = {"input": pages_path, "cores": cores}
    n_docs = pages.count()
    res["n_docs"] = n_docs

    t0 = time.time()
    sh = pack_shards(pages, target_tokens=2_000_000, id_col="url")
    row = sh.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tok_sum"),
        (F.max("shard_id") + 1).alias("n_shards"),
        F.bit_xor(F.xxhash64("url", "shard_id")).alias("assign_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["pack_shards"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "docs": row.docs, "tok_sum": row.tok_sum,
        "n_shards": row.n_shards, "assign_hash": row.assign_hash,
    }
    print(json.dumps({"phase": "pack_shards", **res["pack_shards"]}), flush=True)

    t0 = time.time()
    kept = temperature_resample(pages, strata_col="lang", alpha=0.5, key_col="url")
    row = kept.agg(
        F.count(F.lit(1)).alias("kept"),
        F.count_distinct("lang").alias("langs"),
        F.bit_xor(F.xxhash64("url")).alias("kept_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["temperature_resample"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "kept": row.kept, "langs": row.langs, "kept_hash": row.kept_hash,
    }
    print(json.dumps({"phase": "temperature_resample", **res["temperature_resample"]}), flush=True)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
