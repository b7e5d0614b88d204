#!/usr/bin/env python
"""Round-6: cardinality + phase decomposition probe for the substring
family at a given sf dir (guide §1 — measure before changing).

Phases probed for substring_extent_pairs-shaped work:
  P1 winnow fingerprints per doc (count + avg fps)
  P2 bucket rows / dup-involved buckets / bucket-size histogram
  P3 candidate pairs after dedup
  P4 pairs surviving the exact-LCS >= min_run filter (true pairs)
Also times: stride-1 64-gram hashing (substring_dup_pairs side).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark_local"

from pyspark.sql import functions as F

from dedupe_trees_spark.session import get_spark
from dedupe_trees_spark.operators.substring import (
    winnow_text_udf,
    _pairs_from_gram_sets,
)
from dedupe_trees_spark.queries import load

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
spark = get_spark("substr_probe")

d = load(spark, sf_dir, "documents").select("doc_id", "text")
min_run, k, cap = 64, 24, 4096
w = min_run - k + 1

t0 = time.time()
fps = d.select(F.col("doc_id"), winnow_text_udf(k, w)(F.col("text")).alias("_fp"))
fstats = fps.select(
    F.count(F.lit(1)).alias("docs"), F.sum(F.size("_fp")).alias("fp_rows")
).collect()[0]
print(f"P1 winnow: docs={fstats['docs']} fp_rows={fstats['fp_rows']} [{time.time()-t0:.1f}s]")

t0 = time.time()
buckets = fps.select(
    F.col("doc_id"), F.explode(F.array_distinct(F.col("_fp"))).alias("band_hash")
)
bs = (
    buckets.groupBy("band_hash").agg(F.count(F.lit(1)).alias("n"))
    .agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum((F.col("n") >= 2).cast("long")).alias("dup_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.when(F.col("n") >= 2, F.col("n") * (F.col("n") - 1) / 2)).alias("pair_mass"),
    )
    .collect()[0]
)
print(
    f"P2 buckets: total={bs['buckets']} dup={bs['dup_buckets']} "
    f"max={bs['max_bucket']} pair_mass={bs['pair_mass']} [{time.time()-t0:.1f}s]"
)

t0 = time.time()
cands = _pairs_from_gram_sets(fps, F.col("_fp"), "doc_id", cap)
nc = cands.count()
print(f"P3 candidates: {nc} [{time.time()-t0:.1f}s]")

# P4: exact pairs per the stride-1 64-gram semantics (hash equality)
t0 = time.time()
from dedupe_trees_spark.operators.substring import substring_pairs_exact

true_pairs = substring_pairs_exact(d, id_col="doc_id", k=64, cap=4096).count()
print(f"P4 exact 64-gram pairs: {true_pairs} [{time.time()-t0:.1f}s]")
