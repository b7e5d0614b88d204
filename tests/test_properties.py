from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import shingle_hashes
from dedupe_trees_spark.operators.lsh import add_signature, minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def test_permutation_invariance_of_canonical_output(spark):
    """SURVEY §5.6: shuffling/repartitioning input rows must not change
    component membership or canonical choice (engine output is a pure
    function of the input SET)."""
    from dedupe_trees_spark.queries import q_dedup_canonical_full

    base = sorted(
        (r["doc_id"], r["cluster_size"], r["is_canonical"])
        for r in q_dedup_canonical_full(spark, SF).collect()
    )

    # same query with the source table re-partitioned/shuffled underneath
    d = spark.read.parquet(f"{SF}/documents.parquet")
    d.repartition(13).sortWithinPartitions(F.desc("n_chars")).write.mode(
        "overwrite"
    ).parquet("/tmp/permuted_sf/documents.parquet")
    for t in ["lineitem", "orders", "customer", "supplier", "part", "nation",
              "region", "events", "embeddings"]:
        spark.read.parquet(f"{SF}/{t}.parquet").write.mode("overwrite").parquet(
            f"/tmp/permuted_sf/{t}.parquet"
        )
    permuted = sorted(
        (r["doc_id"], r["cluster_size"], r["is_canonical"])
        for r in q_dedup_canonical_full(spark, "/tmp/permuted_sf").collect()
    )
    assert base == permuted


def test_band_count_monotonicity(spark):
    """More bands (same rows-per-band) ⇒ candidate recall non-decreasing:
    verified pair set must grow monotonically with band count."""
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("url"), "text"
    )
    sigs = add_signature(
        d.withColumn("shingles", shingle_hashes("text", k=3)), num_perm=128, seed=42
    ).cache()
    found = {}
    for bands in (4, 16, 32):
        found[bands] = {
            (r["url_a"], r["url_b"])
            for r in minhash_lsh_pairs(
                sigs, bands=bands, rows=4, cap=256, threshold=0.8
            ).collect()
        }
    assert found[4] <= found[16] <= found[32]
    sigs.unpersist()
