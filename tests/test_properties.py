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


def test_domain_cap_equals_window_on_random_corpora(spark):
    """Randomized (seeded) adversarial inputs: ragged domain sizes, caps
    around the size boundaries — the salted two-phase cap must equal the
    window formulation exactly, for every salt count."""
    import random

    from dedupe_trees_spark.operators.domains import domain_cap, domain_cap_window

    rng = random.Random(1234)
    for round_i in range(3):
        rows = []
        for d in range(rng.randint(2, 8)):
            size = rng.choice([1, 2, 3, rng.randint(4, 60)])
            for i in range(size):
                rows.append((d * 10_000 + i, f"https://d{d}.com/{rng.random():.10f}", f"d{d}.com"))
        df = spark.createDataFrame(rows, ["doc_id", "url", "domain"]).repartition(5)
        cap = rng.choice([1, 2, 5, 37])
        salts = rng.choice([1, 3, 64])
        a = domain_cap(df, cap, salts=salts).select("doc_id")
        b = domain_cap_window(df, cap).select("doc_id")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
            round_i, cap, salts,
        )


def test_decontaminate_consistent_with_report(spark):
    """Survivor set == corpus minus report-contaminated ids, for random
    corpora in a tiny token alphabet (maximal accidental overlap)."""
    import random

    from dedupe_trees_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
    )

    rng = random.Random(99)
    toks = list("abcdefg")
    def doc(k):
        return " ".join(rng.choice(toks) for _ in range(k))

    corpus = spark.createDataFrame(
        [(i, doc(rng.randint(1, 30))) for i in range(120)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame(
        [(1000 + i, doc(rng.randint(1, 15))) for i in range(10)], ["doc_id", "text"]
    )
    rep = contamination_report(corpus, ev, n=4)
    clean_ids = sorted(
        r["doc_id"] for r in rep.filter(~F.col("contaminated")).collect()
    )
    kept_ids = sorted(r["doc_id"] for r in decontaminate(corpus, ev, n=4).collect())
    assert clean_ids == kept_ids
    assert rep.count() == 120  # report covers every corpus row exactly once
