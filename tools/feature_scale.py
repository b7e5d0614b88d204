"""Scale + N→4N evidence for the round-4-late text-feature operators.

Times each operator end-to-end over a large pages input at a given core
count, fully materialized through an aggregate so no compute is skipped:

1. unigram_logprob — corpus-self-trained unigram-LM quality scores
   (token explode → vocab groupBy → broadcast vocab probe → per-doc
   agg; the heavy phase is the ~120-tokens/doc explode, twice).
2. tfidf_keywords — per-doc top-5 TF-IDF terms (map-side sorted-run tf,
   docfreq groupBy, skew-split join, top-k window on the uniform doc
   key).
3. hashing_features — feature-hashing vectorizer at dim 2^18 (codegen
   tokenize/md5-bucket, one map-side-combined (doc, bucket) exchange).

Run at two core counts (e.g. 2 and 8) for the N→4N efficiency pair;
outputs carry value checksums so cross-core-count determinism is
checked, not assumed.

Usage: python tools/feature_scale.py [pages_parquet] [cores] [OUT.json] [ops]
where ops is a comma-separated subset of the three names (default all).
Prints one JSON document (and writes OUT.json if given).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_unigram(pages, n_docs, res):
    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.textstats import unigram_logprob

    t0 = time.time()
    lp = unigram_logprob(pages, id_col="url", min_count=5)
    row = lp.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tok_sum"),
        F.round(F.sum("logprob"), 3).alias("lp_sum"),
    ).collect()[0]
    wall = time.time() - t0
    res["unigram_logprob"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "docs": row.docs, "tok_sum": row.tok_sum, "lp_sum": row.lp_sum,
    }
    print(json.dumps({"phase": "unigram_logprob", **res["unigram_logprob"]}), flush=True)


def _run_tfidf(pages, n_docs, res):
    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.textstats import tfidf_keywords

    t0 = time.time()
    kw = tfidf_keywords(pages, id_col="url", k=5)
    row = kw.agg(
        F.count(F.lit(1)).alias("rows"),
        F.round(F.sum("score"), 3).alias("score_sum"),
        F.bit_xor(F.xxhash64("url", "rank", "term")).alias("kw_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["tfidf_keywords"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "rows": row.rows, "score_sum": row.score_sum, "kw_hash": row.kw_hash,
    }
    print(json.dumps({"phase": "tfidf_keywords", **res["tfidf_keywords"]}), flush=True)


def _run_hashing(pages, n_docs, res):
    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.textstats import hashing_features

    t0 = time.time()
    hf = hashing_features(pages, dim=1 << 18, id_col="url")
    row = hf.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("cnt").alias("tok_sum"),
        F.bit_xor(F.xxhash64("url", "bucket", "cnt")).alias("feat_hash"),
    ).collect()[0]
    wall = time.time() - t0
    res["hashing_features"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "rows": row.rows, "tok_sum": row.tok_sum, "feat_hash": row.feat_hash,
    }
    print(json.dumps({"phase": "hashing_features", **res["hashing_features"]}), flush=True)


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_4m_r4"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    ops = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else {
        "unigram_logprob", "tfidf_keywords", "hashing_features"
    }

    from dedupe_trees_spark.session import get_spark

    os.makedirs("/dev/shm/feature_tmp", exist_ok=True)
    spark = get_spark(
        app_name="feature_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={
            "spark.driver.memory": "48g",
            "spark.local.dir": "/dev/shm/feature_tmp",
        },
    )
    pages = spark.read.parquet(pages_path).select("url", "text")
    res: dict = {"input": pages_path, "cores": cores}
    n_docs = pages.count()
    res["n_docs"] = n_docs

    if "unigram_logprob" in ops:
        _run_unigram(pages, n_docs, res)
    if "tfidf_keywords" in ops:
        _run_tfidf(pages, n_docs, res)
    if "hashing_features" in ops:
        _run_hashing(pages, n_docs, res)

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
