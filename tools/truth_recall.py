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

Usage: python tools/truth_recall.py INPUT_PARQUET CKPT_DIR [threshold] [cap]
Prints one JSON line.

``cap`` (default 0 = off) bounds the per-cluster member count the
ORACLE enumerates: clusters larger than cap keep their cap
lowest-xxhash64(url) members (deterministic), and recall is computed
over pairs within that subset. This exists because the brute-force
truth-pair check is quadratic in cluster size — the 16 M input's hot
template cluster has ~80 k members = 3.2 G truth pairs, infeasible to
enumerate on one box even though the ENGINE handles the cluster fine
(star-shaped buckets keep its edge count linear). A hash-ordered member
subset is statistically a uniform sample of the cluster, so
intra-subset pairs are an unbiased sample of intra-cluster pairs; the
output records cap so sampled points are labeled as such.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    inp, ckpt = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 0.8
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 0

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
    if cap:
        from pyspark.sql import Window

        members = (
            members.withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("truth_cluster").orderBy(F.xxhash64("url"))
                ),
            )
            .filter(F.col("_rk") <= cap)
            .drop("_rk")
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
                "cluster_cap": cap or None,
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
