"""SimHash Hamming-bucket candidate generation (SURVEY.md §2.2 M4).

Equi-join on pigeonhole chunks finds every pair within Hamming ≤ 3 of
the 64-bit fingerprint (4 chunks of 16 bits: ≤3 differing bits can
corrupt at most 3 chunks). The exact popcount(xor) filter then removes
pigeonhole false positives; pipeline callers additionally verify exact
Jaccard so precision is never LSH-dependent.

Bucket skew is handled exactly like MinHash-LSH: chunk buckets larger
than ``cap`` are salted with star chaining (see operators/lsh.py) by
reusing the same candidate_pairs machinery on (chunk, value) keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.simhash import hamming_dist, simhash_chunks, simhash_udf
from dedupe_trees_spark.operators.lsh import candidate_pairs


def add_simhash(df: DataFrame, shingle_col: str = "shingles", out: str = "simhash") -> DataFrame:
    return df.withColumn(out, simhash_udf(F.col(shingle_col)))


def explode_chunks(
    df: DataFrame, sim_col: str = "simhash", id_col: str = "url", n_chunks: int = 4
) -> DataFrame:
    """simhash → (url, band_id, band_hash) rows, reusing the LSH bucket
    schema so candidate_pairs (incl. hot-bucket salting) applies as-is."""
    return df.select(
        id_col,
        F.posexplode(simhash_chunks(sim_col, n_chunks)).alias("band_id", "band_hash"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "url",
    sim_col: str = "simhash",
    n_chunks: int = 4,
    max_hamming: int = 3,
    cap: int = 256,
    scratch_path: str | None = None,
) -> DataFrame:
    """(url, simhash) → pairs with Hamming(simhash) ≤ max_hamming."""
    chunks = explode_chunks(df, sim_col=sim_col, id_col=id_col, n_chunks=n_chunks)
    cands = candidate_pairs(chunks, id_col=id_col, cap=cap, scratch_path=scratch_path)
    sims = df.select(F.col(id_col), F.col(sim_col))
    out = (
        cands.join(
            sims.select(F.col(id_col).alias("url_a"), F.col(sim_col).alias("_sim_a")),
            "url_a",
        )
        .join(
            sims.select(F.col(id_col).alias("url_b"), F.col(sim_col).alias("_sim_b")),
            "url_b",
        )
        .withColumn("hamming", hamming_dist(F.col("_sim_a"), F.col("_sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("url_a", "url_b", "hamming")
    )
    return out
