"""Scaling/capacity harness for span_scrub (cross-doc span removal).

Runs the operator end-to-end over a pages parquet at a given core
count, fully materialized through an aggregate so no compute is
skipped, with a value checksum so cross-core-count determinism is
checked, not assumed. Same protocol as the other ladders: run at two
core counts (e.g. 2 and 8) for the N→4N efficiency pair, interleave
repetitions, shuffle dirs on tmpfs.

Usage: python tools/span_scale.py [pages_parquet] [cores] [OUT.json]
Prints one JSON document (and writes OUT.json if given).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_1m_r4"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.substring import span_scrub
    from dedupe_trees_spark.session import get_spark

    os.makedirs("/dev/shm/span_tmp", exist_ok=True)
    spark = get_spark(
        app_name="span_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/span_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "text")
    res: dict = {"input": pages_path, "cores": cores}
    n_docs = pages.count()
    res["n_docs"] = n_docs

    t0 = time.time()
    scrubbed = span_scrub(pages, id_col="url", min_run=64, k=24, cap=256)
    row = scrubbed.agg(
        F.count(F.lit(1)).alias("modified_docs"),
        F.sum("removed_chars").alias("removed_chars"),
        F.sum("n_spans").alias("n_spans"),
        F.bit_xor(F.xxhash64("url", "clean_text")).alias("clean_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["span_scrub"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "modified_docs": row.modified_docs,
        "removed_chars": row.removed_chars,
        "n_spans": row.n_spans,
        "clean_hash": row.clean_hash,
    }
    print(json.dumps(res), flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
