"""Scale + N->4N scaling evidence for the WARC ingest/export edge.

Protocol mirrors BENCH/BASELINE.md: identical job + identical input at
two parallelism levels. The export target file count is FIXED (16) so
the job is the same at every core count; the ingest ladder reads the
same exported directory at each core count. Determinism is checked by
an order-insensitive content signature (count + bit_xor of
xxhash64(url || text)) that must match the parquet input's.

Usage: python tools/warc_scale.py [pages_parquet] [cores] [OUT.json] \
           [export|ingest|both] [warc_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 16  # fixed across core counts: identical job everywhere


def _sig(df):
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.concat_ws("\x00", "url", "text"))).alias("h"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    return {"n": row["n"], "hash": int(row["h"]), "chars": int(row["chars"])}


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_1m_r4"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    mode = sys.argv[4] if len(sys.argv) > 4 else "both"
    warc_dir = sys.argv[5] if len(sys.argv) > 5 else "/tmp/spark_graft_bench/warc_export"

    from pyspark.sql import functions as F

    from dedupe_trees_spark.session import get_spark
    from dedupe_trees_spark.sources.warc import read_pages_warc, write_pages_warc

    spark = get_spark(
        app_name="warc_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/shaping_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "warc_ts", "text")
    res: dict = {"input": pages_path, "cores": cores, "mode": mode,
                 "n_files": N_FILES}
    n_docs = pages.count()
    res["n_docs"] = n_docs

    # warmup: JVM codegen + arrow path. sample() (not limit(), which
    # collapses to one partition) + files=2*cores so EVERY Python
    # worker slot forks/imports before the timed section — the
    # warm-every-slot rule from docs/SCALE.md
    warm = pages.sample(0.002, seed=1)
    write_pages_warc(warm, "/tmp/warc_warm", files=2 * cores).collect()
    read_pages_warc(spark, "/tmp/warc_warm/*.warc.gz").count()
    shutil.rmtree("/tmp/warc_warm", ignore_errors=True)

    if mode in ("export", "both"):
        shutil.rmtree(warc_dir, ignore_errors=True)
        t0 = time.time()
        manifest = write_pages_warc(pages, warc_dir, files=N_FILES).collect()
        wall = time.time() - t0
        res["export"] = {
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall),
            "files": len(manifest),
            "warc_bytes": sum(m["n_bytes"] for m in manifest),
            "records": sum(m["n_records"] for m in manifest),
        }
        print(json.dumps({"phase": "export", **res["export"]}), flush=True)

    if mode in ("ingest", "both"):
        t0 = time.time()
        back = read_pages_warc(spark, f"{warc_dir}/*.warc.gz")
        sig = _sig(back)
        wall = time.time() - t0
        res["ingest"] = {
            "wall_sec": round(wall, 1),
            "docs_per_sec": round(n_docs / wall),
            **sig,
        }
        res["input_sig"] = _sig(pages)
        res["roundtrip_ok"] = (
            res["ingest"]["n"] == res["input_sig"]["n"]
            and res["ingest"]["hash"] == res["input_sig"]["hash"]
        )
        print(json.dumps({"phase": "ingest", **res["ingest"],
                          "roundtrip_ok": res["roundtrip_ok"]}), flush=True)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
