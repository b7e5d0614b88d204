"""Scale + N→4N evidence for the round-5 token/label operators.

Times the two round-5 additions end-to-end over a large pages input,
materialized through aggregates so no compute is skipped (same harness
shape as tools/feature_scale.py):

1. bpe_count — BPE-faithful token counting (functions/bpe.py): the
   Arrow-batched pandas UDF with the per-batch word→count cache. Pure
   map over the corpus — the phase a 10^12-doc shard-budget pass pays.
2. nb_lang_id — Naive-Bayes language-ID train + infer
   (operators/textstats.py::nb_lang_classifier): in-engine training on
   the corpus' own lang labels, broadcast model, argmax decode. The
   reported agree_frac vs the planted lang column is a DETERMINISM
   check, not accuracy: the generator's labels are independent of its
   text (all langs share one vocab), so ~majority-prior agreement is
   the ceiling here — accuracy is asserted on a separable corpus in
   tests/test_textstats.py::TestNbLangClassifier.

Outputs carry value checksums so cross-core-count determinism is
checked, not assumed.

Usage: python tools/bpe_scale.py [pages_parquet] [cores] [OUT.json] [ops]
where ops ⊆ {bpe_count,nb_lang_id} (default both).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_bpe(pages, n_docs, res):
    from pyspark.sql import functions as F

    from dedupe_trees_spark.functions.bpe import bpe_token_count

    t0 = time.time()
    counted = pages.select(
        "url", bpe_token_count("text").alias("n_bpe")
    )
    row = counted.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_bpe").alias("bpe_sum"),
        F.bit_xor(F.xxhash64("url", "n_bpe")).alias("cnt_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["bpe_count"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "docs": row.docs, "bpe_sum": row.bpe_sum, "cnt_hash": row.cnt_hash,
    }
    print(json.dumps({"phase": "bpe_count", **res["bpe_count"]}), flush=True)


def _run_nb(pages, n_docs, res):
    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.textstats import nb_lang_classifier

    t0 = time.time()
    pred = nb_lang_classifier(pages, label_col="lang", id_col="url")
    row = (
        pred.join(pages.select("url", "lang"), "url")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("pred_lang") == F.col("lang")).cast("long")).alias(
                "agree"
            ),
            F.bit_xor(F.xxhash64("url", "pred_lang")).alias("pred_hash"),
        )
        .collect()[0]
    )
    wall = time.time() - t0
    res["nb_lang_id"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "docs": row.docs, "agree": row.agree,
        "agree_frac": round(row.agree / max(row.docs, 1), 4),
        "pred_hash": row.pred_hash,
    }
    print(json.dumps({"phase": "nb_lang_id", **res["nb_lang_id"]}), flush=True)


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_1000000"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    ops = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else {
        "bpe_count", "nb_lang_id"
    }

    from dedupe_trees_spark.session import get_spark

    os.makedirs("/dev/shm/feature_tmp", exist_ok=True)
    spark = get_spark(
        app_name="bpe_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/feature_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "text", "lang")
    res: dict = {"input": pages_path, "cores": cores}
    n_docs = pages.count()
    res["n_docs"] = n_docs
    # warm every executor slot (sample() preserves partitioning — the
    # limit() trap collapses to one partition; docs/SCALE.md)
    pages.sample(0.02, seed=1).select(_warmup_col()).collect()

    if "bpe_count" in ops:
        _run_bpe(pages, n_docs, res)
    if "nb_lang_id" in ops:
        _run_nb(pages, n_docs, res)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


def _warmup_col():
    """One cheap pandas-UDF column so every worker slot forks+imports
    before the timed sections."""
    from pyspark.sql import functions as F

    from dedupe_trees_spark.functions.bpe import bpe_token_count

    return bpe_token_count(F.substring("text", 1, 64)).alias("_w")


if __name__ == "__main__":
    raise SystemExit(main())
