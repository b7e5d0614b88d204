"""Emitted-pair precision audit: recompute every pair's defining
predicate independently of the pipeline's verify join.

The north rule gates RECALL (≥ 0.99, tools/truth_recall.py); this tool
closes the other half: every pair the engine emitted must be a REAL
duplicate under the engine's own definitions, recomputed from the raw
normalized text with none of the pipeline's intermediate state:

  exact    — content hashes equal AND normalized text byte-identical
  minhash  — exact shingle-set Jaccard ≥ threshold (recomputed from
             token hashes; the pipeline's verify join already claims
             this, so any miss here is a verify-stage bug)
  simhash  — same exact-Jaccard bar (the pipeline gates simhash pairs
             on J ≥ threshold in addition to Hamming distance)
  substr   — exact longest-common-substring ≥ substring_k chars via
             the generalized-suffix-array kernel (a shared winnow
             fingerprint implies a shared k-gram modulo hash collision
             — this check is what bounds the collision term)

Also reported per kind: the fraction of emitted pairs joining two
members of the SAME planted truth cluster. Cross-cluster pairs are not
errors — independently edited pages can be organically near-duplicate
— but the split quantifies how much of the engine's output is planted
vs organic signal.

Usage: python tools/pair_precision.py INPUT_PARQUET CKPT_DIR
           [threshold] [substring_k]
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
    substring_k = int(sys.argv[4]) if len(sys.argv) > 4 else 48

    from pyspark.sql import functions as F

    from dedupe_trees_spark.functions.minhash import shingle_set_udf
    from dedupe_trees_spark.functions.text import token_hashes
    from dedupe_trees_spark.operators.lsh import jaccard_expr
    from dedupe_trees_spark.operators.substring import lcs_run_udf
    from dedupe_trees_spark.session import get_spark

    spark = get_spark("pair_precision")
    sigs = spark.read.parquet(f"{ckpt}/signatures").select(
        "nid", "url", "norm", "content_hash"
    )
    pairs = spark.read.parquet(f"{ckpt}/pairs")
    truth = (
        spark.read.parquet(inp)
        .select("url", "truth_cluster", "truth_kind")
        .join(sigs.select("url", "nid"), "url")
        .select("nid", "truth_cluster")
    )

    side = lambda suf: sigs.select(  # noqa: E731
        F.col("nid").alias(f"url_{suf}"),
        F.col("norm").alias(f"norm_{suf}"),
        F.col("content_hash").alias(f"hash_{suf}"),
    )
    t_side = lambda suf: truth.select(  # noqa: E731
        F.col("nid").alias(f"url_{suf}"), F.col("truth_cluster").alias(f"tc_{suf}")
    )
    joined = (
        pairs.join(side("a"), "url_a")
        .join(side("b"), "url_b")
        .join(t_side("a"), "url_a", "left")
        .join(t_side("b"), "url_b", "left")
    )

    sh = shingle_set_udf(3)
    jac = jaccard_expr(
        sh(token_hashes("norm_a")), sh(token_hashes("norm_b"))
    )
    holds = (
        F.when(
            F.col("kind") == "exact",
            (F.col("hash_a") == F.col("hash_b"))
            & (F.col("norm_a") == F.col("norm_b")),
        )
        .when(F.col("kind").isin("minhash", "simhash"), jac >= threshold)
        .when(
            F.col("kind") == "substr",
            lcs_run_udf()(F.col("norm_a"), F.col("norm_b")) >= substring_k,
        )
        .otherwise(F.lit(False))
    )
    same_truth = (
        F.col("tc_a").isNotNull()
        & F.col("tc_b").isNotNull()
        & (F.col("tc_a") == F.col("tc_b"))
    )
    agg = (
        joined.withColumn("holds", holds.cast("long"))
        .withColumn("same_truth", same_truth.cast("long"))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("emitted"),
            F.sum("holds").alias("holds"),
            F.sum("same_truth").alias("same_truth_cluster"),
        )
        .collect()
    )
    per_kind = {
        r["kind"]: {
            "emitted": r["emitted"],
            "holds": r["holds"],
            "precision": round(r["holds"] / r["emitted"], 6),
            "same_truth_cluster": r["same_truth_cluster"],
            "organic_cross_cluster": r["emitted"] - r["same_truth_cluster"],
        }
        for r in agg
    }
    total_e = sum(v["emitted"] for v in per_kind.values())
    total_h = sum(v["holds"] for v in per_kind.values())
    print(
        json.dumps(
            {
                "input": inp,
                "ckpt": ckpt,
                "threshold": threshold,
                "substring_k": substring_k,
                "emitted_pairs": total_e,
                "holding_pairs": total_h,
                "precision": round(total_h / total_e, 6) if total_e else None,
                "per_kind": per_kind,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
