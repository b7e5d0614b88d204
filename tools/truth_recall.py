"""Dup-pair recall vs the generator's planted ground truth.

North rule (BASELINE.json): dup-pair recall ≥ 0.99 at the shipped
shingle/signature config. The synthetic pages table plants truth
clusters (datagen.py: exact / near / substr / hot-template); this tool
computes, at ANY scale the input exists at:

  truth pairs  = all intra-cluster pairs that are REAL duplicates under
                 the engine's own definitions —
                 exact/copy: byte-identical text (J = 1 trivially),
                 substr:     every member embeds the same ≥200-char span
                             (≥ the winnow guarantee of k+w−1 = 96),
                 near/hot:   pairs whose EXACT shingle Jaccard ≥ the
                             configured threshold (members are edited
                             independently, so member–member pairs can
                             legitimately fall below 0.8 — those are not
                             truth and not counted either way)
  engine pairs = same-component pairs in the run's canonical output

  recall = |truth ∩ engine| / |truth|, overall and per truth kind.

Usage: python tools/truth_recall.py INPUT_PARQUET CKPT_DIR [threshold]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    inp, ckpt = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8

    from pyspark.sql import functions as F

    from dedupe_trees_spark.functions.minhash import shingle_set_udf
    from dedupe_trees_spark.functions.text import normalize_text, token_hashes
    from dedupe_trees_spark.operators.lsh import jaccard_expr
    from dedupe_trees_spark.session import get_spark

    spark = get_spark("truth_recall")
    pages = spark.read.parquet(inp)
    comp = (
        spark.read.parquet(f"{ckpt}/canonical")
        .select("url", "component_id")
    )

    members = (
        pages.filter(F.col("truth_kind") != "unique")
        .select(
            "truth_cluster",
            "truth_kind",
            "url",
            shingle_set_udf(3)(token_hashes(normalize_text("text"))).alias("sh"),
        )
        .join(comp, "url")
    )
    # intra-cluster self-join: cluster sizes are bounded (blocks ≤ 8;
    # the hot template cluster is n_docs/hot_every), so the pair count
    # is ~m²/2 on the hot cluster and tiny elsewhere.
    a = members.select(
        F.col("truth_cluster").alias("tc"), F.col("truth_kind").alias("kind"),
        F.col("url").alias("url_a"), F.col("sh").alias("sh_a"),
        F.col("component_id").alias("comp_a"),
    )
    b = members.select(
        F.col("truth_cluster").alias("tc"),
        F.col("url").alias("url_b"), F.col("sh").alias("sh_b"),
        F.col("component_id").alias("comp_b"),
    )
    pairs = a.join(b, "tc").filter(F.col("url_a") < F.col("url_b"))
    is_truth = F.when(
        F.col("kind").isin("near"),
        jaccard_expr(F.col("sh_a"), F.col("sh_b")) >= threshold,
    ).otherwise(F.lit(True))
    scored = pairs.withColumn("is_truth", is_truth).withColumn(
        "found", F.col("comp_a") == F.col("comp_b")
    )
    agg = (
        scored.filter("is_truth")
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("truth_pairs"),
            F.sum(F.col("found").cast("long")).alias("found_pairs"),
        )
        .collect()
    )
    per_kind = {
        r["kind"]: {
            "truth_pairs": r["truth_pairs"],
            "found_pairs": r["found_pairs"],
            "recall": round(r["found_pairs"] / r["truth_pairs"], 6),
        }
        for r in agg
    }
    total_t = sum(v["truth_pairs"] for v in per_kind.values())
    total_f = sum(v["found_pairs"] for v in per_kind.values())
    print(
        json.dumps(
            {
                "input": inp,
                "threshold": threshold,
                "truth_pairs": total_t,
                "found_pairs": total_f,
                "recall": round(total_f / total_t, 6) if total_t else None,
                "per_kind": per_kind,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
