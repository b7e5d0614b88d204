"""Scale + skew evidence for the sub-document cleaning operators (r4).

Runs the two new heavy text-cleaning paths over a large pages input
(default: the 16M-doc capacity input, whose planted template cluster
makes single paragraph keys ~10^5-hot):

1. repetition_features — the zero-shuffle quality map. Wall here is
   the per-doc array-arithmetic cost at corpus scale; there is no
   exchange to hide behind (plan-asserted in tests/test_plans.py).
2. paragraph census + paragraph_dedup — the corpus-wide
   first-occurrence keeper. The hot template cluster means the
   groupBy(hash) keeper sees individual paragraph keys with ~80k+
   occurrences; the skew-safety claim (map-side partial agg, no
   window over occurrence lists) is what this measures. Reported:
   paragraph rows, distinct paragraphs, hottest key's occurrence
   count, rows kept, chars in vs chars out, wall per phase.

Usage: python tools/subdoc_scale.py [pages_parquet] [cores] [OUT.json]
Prints one JSON document (and writes OUT.json if given).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_bench/pages_16m"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from dedupe_trees_spark.operators.paragraphs import (
        paragraph_dedup,
        paragraph_dup_stats,
        token_chunk_paragraphs,
    )
    from dedupe_trees_spark.operators.textstats import repetition_features
    from dedupe_trees_spark.session import get_spark

    spark = get_spark(
        app_name="subdoc_scale",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
        extra_conf={"spark.driver.memory": "48g", "spark.local.dir": "/dev/shm/subdoc_tmp"},
    )
    docs = spark.read.parquet(pages_path).select(
        F.xxhash64("url").alias("doc_id"), "text"
    )
    res: dict = {"input": pages_path, "cores": cores}

    t0 = time.time()
    n_docs = docs.count()
    res["n_docs"] = n_docs

    # 1 — repetition quality map (chunk=8, contract config)
    t0 = time.time()
    rep = repetition_features(docs, chunk=8)
    agg = rep.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dup_line_frac").alias("avg_dlf"),
        F.avg("top_bigram_frac").alias("avg_tbf"),
    ).collect()[0]
    res["repetition"] = {
        "wall_sec": round(time.time() - t0, 1),
        "docs_per_sec": round(n_docs / (time.time() - t0)),
        "avg_dup_line_frac": round(agg["avg_dlf"], 6),
        "avg_top_bigram_frac": round(agg["avg_tbf"], 6),
    }
    print(json.dumps({"phase": "repetition", **res["repetition"]}), flush=True)

    # 2a — paragraph census (one exchange, partial-agg collapsed)
    t0 = time.time()
    paras = token_chunk_paragraphs(docs, chunk=8)
    census = paragraph_dup_stats(paras)
    crow = census.agg(
        F.count(F.lit(1)).alias("dup_paras"),
        F.max("n_occ").alias("hottest_occ"),
        F.sum("n_occ").alias("dup_occurrences"),
    ).collect()[0]
    res["census"] = {
        "wall_sec": round(time.time() - t0, 1),
        "dup_paragraphs": crow["dup_paras"],
        "hottest_paragraph_occurrences": crow["hottest_occ"],
        "total_dup_occurrences": crow["dup_occurrences"],
    }
    print(json.dumps({"phase": "census", **res["census"]}), flush=True)

    # 2b — full first-occurrence dedup + doc rebuild
    t0 = time.time()
    clean = paragraph_dedup(docs, paras, sep=" ")
    drow = clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("clean_text")).alias("chars_out"),
        F.sum((F.length("clean_text") == 0).cast("long")).alias("emptied_docs"),
    ).collect()[0]
    chars_in = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    wall = time.time() - t0
    res["dedup"] = {
        "wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "rows_out": drow["n"],
        "chars_in": chars_in,
        "chars_out": drow["chars_out"],
        "chars_removed_pct": round(100 * (1 - drow["chars_out"] / chars_in), 2),
        "emptied_docs": drow["emptied_docs"],
    }
    print(json.dumps({"phase": "dedup", **res["dedup"]}), flush=True)

    print(json.dumps(res), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
