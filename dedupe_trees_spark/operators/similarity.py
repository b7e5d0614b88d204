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


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine from vectors plus their PRE-COMPUTED L2 norms.

    ``cosine()`` re-aggregates both norms per evaluation; fine for a
    per-doc projection, ruinous per candidate pair (the norm pass must
    be linear in docs, not in candidate volume). Callers project
    ``l2_norm`` as a plain double column BEFORE the candidate join —
    the shuffle materializes it, so Catalyst cannot collapse the norm
    aggregate back into the per-pair projection (the known
    higher-order-lambda projection-collapse trap)."""
    denom = na * nb
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
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    scored = (
        corpus.select(id_col, vec_col, l2_norm(F.col(vec_col)).alias("_cn"))
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
    )
    scored = scored.withColumn(
        "cos_sim",
        cosine_prenormed(
            F.col("_qvec"), F.col(vec_col), F.col("_qn"), F.col("_cn")
        ).cast("double"),
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
    c = corpus.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("_cn")
    ).withColumn("bucket", F.explode(srp(F.col(vec_col))))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    ).withColumn("bucket", F.explode(srp(F.col("_qvec"))))
    # queries are tiny by construction — broadcast so the corpus-side
    # bucket table is never shuffled for this join
    cands = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.withColumn(
        "cos_sim",
        cosine_prenormed(
            F.col("_qvec"), F.col(vec_col), F.col("_qn"), F.col("_cn")
        ).cast("double"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )


def neardup_pairs(
    corpus: DataFrame,
    tau: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
    bucket_cap: int = 0,
    mode: str = "all",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_sim ≥ tau).

    The dedup-family sibling of ``lsh_topk``: instead of top-k per query
    it emits EVERY unordered corpus pair whose exact cosine clears the
    threshold, with SRP-LSH bucketing as the blocking step so the join
    is bucket-equi, never an all-pairs cross.  Plan shape (the part that
    must survive 10^12 rows):

    - one ``explode`` → (id, bucket) table, ``n_tables`` rows per doc;
    - self-join on ``bucket`` — a hash-partitioned equi-join, the only
      exchange proportional to candidate volume;
    - ``dropDuplicates`` on the pair key before the cosine verify, so a
      pair colliding in several tables is scored once;
    - exact-cosine verify (JVM ``aggregate``/``zip_with``, no Python) —
      emitted pairs are therefore exact, LSH only gates recall.

    Parameter regimes: SRP collision probability per bit is 1 − θ/π, so
    at web-scale near-dup thresholds (tau ≥ 0.9, θ ≤ 26°) ``n_bits=16``
    keeps buckets tiny and candidates sub-quadratic.  At the loose
    thresholds the synthetic fixture data requires (tau = 0.35 — its
    random embeddings have no high-cosine pairs), recall-1.0 demands few
    bits and many tables, which at toy n approaches all-pairs; that is a
    property of the threshold, not the operator.

    ``bucket_cap`` > 0 drops buckets with more members (hot-bucket
    guard, same idea as the text-LSH ``bucket_cap``): a bucket holding
    m members contributes m(m−1)/2 candidates, so one degenerate bucket
    (e.g. the all-zeros region) can dominate the join; capped buckets
    trade bounded recall loss for a hard candidate ceiling.

    ``mode`` picks the candidate topology:

    * ``"all"`` (default, the oracle-pinned contract): every unordered
      bucket pair — output is exactly {pairs with cos ≥ tau} up to LSH
      blocking recall. A dense m-member cluster emits Θ(m²) pairs.
    * ``"star"``: per bucket, only (min-id member, other) edges — the
      text pipeline's m−1-edge spanning-star bound carried to the
      embedding family. Per cluster per table that is ≤ m edges, so
      pair volume is LINEAR in cluster size; CC over several tables'
      stars reconnects what any one star misses. Use for clustering /
      semantic dedup (component structure), not for enumerating every
      qualifying pair: a star edge failing the exact-cosine verify
      drops that member from that bucket's star, where all-pairs would
      still have reached it through a different partner (measured at
      4M vectors / 400-member clusters: 77.4M → 1.94M emitted pairs,
      pairs stage 558.8 s → 27.2 s (20.5×), CC 95.2 → 13.1 s, cluster
      recovery still 1000/1000 with sampled truth-pair recall 1.0 —
      BENCH/embscale_4m_c32_b22{,_star}.json).
    """
    if mode not in ("all", "star"):
        raise ValueError(f"mode must be 'all' or 'star', got {mode!r}")
    # The bucket self-join and the pair-dedup run over SLIM (bucket, id)
    # rows; vectors attach per UNIQUE candidate pair afterwards. The
    # first formulation carried both full vectors through the join AND
    # the dropDuplicates exchange — at 1M×64-dim that is ~23 GB through
    # two exchanges vs ~0.4 GB slim (measured A/B below); at 10^12 rows
    # it is the difference between a candidate-proportional verify and
    # shuffling the corpus n_tables × candidate-multiplicity times.
    srp = srp_udf(dim, n_bits, n_tables, seed)
    bk = corpus.select(id_col, F.explode(srp(F.col(vec_col))).alias("bucket"))
    if bucket_cap:
        w = Window.partitionBy("bucket")
        bk = bk.withColumn("_bn", F.count(F.lit(1)).over(w)).filter(
            F.col("_bn") <= bucket_cap
        ).drop("_bn")
    if mode == "star":
        # one window exchange tags each row with its bucket's min id;
        # edges = (center, member), m−1 per bucket instead of m(m−1)/2
        wb = Window.partitionBy("bucket")
        cands = (
            bk.withColumn("_ctr", F.min(id_col).over(wb))
            .filter(F.col(id_col) != F.col("_ctr"))
            .select(
                F.col("_ctr").alias("id_a"), F.col(id_col).alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        cands = (
            bk.select("bucket", F.col(id_col).alias("id_a"))
            .join(bk.select("bucket", F.col(id_col).alias("id_b")), "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .select("id_a", "id_b")
        )
    vecs = corpus.select(
        id_col,
        F.col(vec_col).alias("_v"),
        l2_norm(F.col(vec_col)).alias("_n"),
    )
    scored = cands.join(
        vecs.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_n").alias("_na"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_n").alias("_nb"),
        ),
        "id_b",
    )
    return (
        scored.withColumn(
            "cos_sim",
            cosine_prenormed(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ).cast("double"),
        )
        .filter(F.col("cos_sim") >= tau)
        .select("id_a", "id_b", "cos_sim")
    )


def ivf_assign_udf(centroids_unit: np.ndarray, nprobe: int):
    """Nearest-centroid cell ids (array<int>, ``nprobe`` entries, best
    first). Centroids arrive unit-normalized; assignment is one matmul
    per Arrow batch. Ties break deterministically on centroid index."""
    C = centroids_unit.astype(np.float32)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        if n == 0:
            return pd.Series([], dtype=object)
        M = np.stack([np.asarray(v, dtype=np.float32) for v in vecs])
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (M / norms) @ C.T  # n × n_cells
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    return _assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF-Flat) index — the
    partition-based sibling of the SRP-LSH path (``lsh_topk``); both are
    sanctioned scale paths, IVF trading LSH's probabilistic recall for a
    tunable cells/nprobe recall-vs-cost dial.

    Index build, all deterministic:
    - centroids = the ``n_cells`` corpus vectors with the lowest
      ``xxhash64(id)`` — a uniform corpus sample, the IVF "training"
      step reduced to sampling (production would Lloyd-refine the same
      sample; recall is governed by nprobe either way). TakeOrdered, so
      no full sort, and the centroid matrix is driver-side tiny.
    - every corpus vector is assigned to its single nearest centroid
      (vectorized matmul UDF) — a scan, no shuffle of the corpus.

    Search: each query probes its ``nprobe`` nearest cells; candidates =
    corpus rows in those cells via a broadcast equi-join on cell id
    (corpus never shuffles); exact cosine re-rank with pre-computed
    norms. Expected candidate volume = corpus × nprobe / n_cells.
    """
    cents_rows = (
        corpus.select(
            F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("_h")
        )
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    C = np.stack([np.asarray(r["v"], dtype=np.float64) for r in cents_rows])
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    C = C / norms

    assign1 = ivf_assign_udf(C, 1)
    assignp = ivf_assign_udf(C, min(nprobe, len(C)))
    c = corpus.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("_cn")
    ).withColumn("cell", assign1(F.col(vec_col))[0])
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    ).withColumn("cell", F.explode(assignp(F.col("_qvec"))))
    cands = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.withColumn(
        "cos_sim",
        cosine_prenormed(
            F.col("_qvec"), F.col(vec_col), F.col("_qn"), F.col("_cn")
        ).cast("double"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cos_sim", "rnk")
    )
