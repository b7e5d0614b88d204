"""Embedding similarity search over array<float> columns.

Two paths, one semantic (top-k cosine neighbors):

1. ``brute_force_topk`` — exact: broadcast the (small) query set, score
   every (query, corpus) pair with a JVM-side ``aggregate(zip_with(...))``
   dot product, window top-k. At 10^12 corpus rows this is a single
   pass over the corpus per query batch — the right baseline, and the
   verification oracle for the approximate path.

2. ``lsh_topk`` — approximate: signed-random-projection (SRP) bucket
   hashing in a vectorized pandas UDF; candidates = same-bucket pairs
   (multi-probe via several independent tables), exact cosine re-rank
   within candidates. Sub-linear candidate volume at scale.

Embeddings are assumed L2-normalizable (zero vectors get cosine 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos_sim, rnk ≤ k).

    Excludes self-matches (same id). The query side is broadcast — the
    corpus is never shuffled, only scanned.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(id_col, vec_col).crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = scored.withColumn(
        "cos_sim",
        cosine(F.col("_qvec"), F.col(vec_col)).cast("double"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def srp_udf(dim: int, n_bits: int = 16, n_tables: int = 4, seed: int = 42):
    """Signed-random-projection bucket ids: array<long>, one per table."""
    rng = np.random.default_rng([seed, 7])
    planes = rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _srp(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])  # n×dim
        out = np.zeros((n, n_tables), dtype=np.int64)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        for t in range(n_tables):
            bits = (M @ planes[t].T) > 0  # n×n_bits
            out[:, t] = bits @ weights + (t << 32)
        return pd.Series(list(out))

    return _srp


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    n_bits: int = 12,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP bucket candidates, exact cosine re-rank."""
    srp = srp_udf(dim, n_bits, n_tables, seed)
    c = corpus.select(id_col, vec_col).withColumn(
        "bucket", F.explode(srp(F.col(vec_col)))
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("bucket", F.explode(srp(F.col("_qvec"))))
    # queries are tiny by construction — broadcast so the corpus-side
    # bucket table is never shuffled for this join
    cands = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.withColumn(
        "cos_sim", cosine(F.col("_qvec"), F.col(vec_col)).cast("double")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )
