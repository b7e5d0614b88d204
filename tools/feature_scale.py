"""Scale + N→4N evidence for the round-4-late text-feature operators.

Times each operator end-to-end over a large pages input at a given core
count, fully materialized through an aggregate so no compute is skipped:

1. unigram_logprob — corpus-self-trained unigram-LM quality scores
   (token explode → vocab groupBy → broadcast vocab probe → per-doc
   agg; the heavy phase is the ~120-tokens/doc explode, twice).
2. tfidf_keywords — per-doc top-5 TF-IDF terms (tf groupBy on
   (doc, term), docfreq groupBy, skew-split join, top-k window on the
   uniform doc key).

Run at two core counts (e.g. 2 and 8) for the N→4N efficiency pair;
outputs carry value checksums so cross-core-count determinism is
checked, not assumed.

Usage: python tools/feature_scale.py [pages_parquet] [cores] [OUT.json]
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

    from dedupe_trees_spark.operators.textstats import (
        tfidf_keywords,
        unigram_logprob,
    )
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

    if out_path:
        with open(out_path, "w") as fh:
            json.dump(res, fh, indent=1)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
