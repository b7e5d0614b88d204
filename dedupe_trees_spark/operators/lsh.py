"""MinHash-LSH candidate generation with explicit skew handling.

Pipeline shape (SURVEY.md §2.2 "LSH candidate self-join"):

    signatures ──explode──▶ bands(url, band_id, band_hash)
    bands ──bucket-count──▶ cold buckets (≤ cap)   → all-pairs self-join
                           hot buckets  (> cap)    → salted sub-buckets:
                               all-pairs within a salt group
                               + one verified edge per salt group to the
                                 bucket representative (keeps the bucket
                                 connected without m·(m−1)/2 expansion)
    pairs ──dropDuplicates──▶ verify exact Jaccard on shingle-hash sets

Why this scales: a band bucket with m members yields m(m−1)/2 pairs —
one hot template cluster of 10^6 pages would otherwise emit 5·10^11
pairs from a single bucket. Capping at ``cap`` and salting bounds the
per-bucket pair count to ~m·cap/2 while connected components still sees
the whole bucket as one component (salt groups are chained through the
bucket rep). AQE's skew-join handles residual partition imbalance.

Verification is exact (JVM-side ``array_intersect`` on the distinct
shingle-hash sets), so candidate false positives never reach the
cluster graph — LSH affects recall only, never precision. This is what
makes the DuckDB brute-force-Jaccard oracle an exact twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.minhash import band_hash_array, minhash_udf


def _default_scratch(spark) -> str | None:
    """Scratch root for spilled intermediates when the caller gives none.

    Order: explicit ``spark.dedupe_trees.scratch`` conf (set this to a
    shared filesystem on real clusters) → a driver-local temp dir when
    running in local mode (driver FS == executor FS there) → None, which
    falls back to localCheckpoint (cluster-correct, but pins executor
    storage until the RDD is GC'd).
    """
    conf_dir = spark.conf.get("spark.dedupe_trees.scratch", None)
    if conf_dir:
        import uuid

        return f"{conf_dir}/scratch_{uuid.uuid4().hex}"
    if spark.sparkContext.master.startswith("local"):
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="dedupe_scratch_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        return d + "/t"
    return None


def add_signature(
    df: DataFrame,
    shingle_col: str = "shingles",
    out: str = "minhash",
    num_perm: int = 128,
    seed: int = 42,
) -> DataFrame:
    return df.withColumn(out, minhash_udf(num_perm, seed)(F.col(shingle_col)))


def explode_bands(
    df: DataFrame,
    sig_col: str = "minhash",
    id_col: str = "url",
    bands: int = 32,
    rows: int = 4,
) -> DataFrame:
    """signatures → (url, band_id, band_hash), one row per band."""
    return df.select(
        id_col,
        F.posexplode(band_hash_array(sig_col, bands, rows)).alias(
            "band_id", "band_hash"
        ),
    )


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "url",
    cap: int = 256,
    scratch_path: str | None = None,
) -> DataFrame:
    """Bucket-join candidates with hot-bucket salting; distinct (a,b) pairs.

    Returns columns (url_a, url_b) with url_a < url_b. Pairs surviving
    here are *candidates* — callers must verify before trusting them.

    If ``bands_df`` carries a ``src`` column (bucket provenance —
    'minhash' / 'simhash' / 'substr'), buckets from SEVERAL candidate
    generators can share this ONE pass (one count shuffle, one
    self-join) and the output gains ``srcs: array<string>`` per pair.

    Materialization: ``tagged`` feeds two self-joins + the rep
    aggregations (5 references); without materialization every reference
    re-evaluates the upstream explode + count shuffle — measured 4×
    slowdown on the pairs stage. It is spilled to parquet scratch and
    re-read (``scratch_path``, or an auto local-mode temp dir / the
    ``spark.dedupe_trees.scratch`` conf via _default_scratch) — no
    executor memory is pinned and nothing stays cached after the job;
    measured ~1.6× faster than the persist+localCheckpoint alternative
    at sf0.1. Only when no scratch location exists (cluster mode, no
    conf) does it fall back to persist + eager localCheckpoint, with
    ``tagged`` unpersisted before returning.
    """
    has_src = "src" in bands_df.columns
    src_a = [F.col("a.src").alias("src")] if has_src else []
    counts = bands_df.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    tagged = bands_df.join(counts, ["band_id", "band_hash"])
    if scratch_path is None:
        scratch_path = _default_scratch(bands_df.sparkSession)
    if scratch_path is not None:
        tagged.write.mode("overwrite").parquet(scratch_path)
        tagged = bands_df.sparkSession.read.parquet(scratch_path)
    else:
        tagged = tagged.persist()

    cold = tagged.filter(F.col("bucket_n") <= cap).select(
        "band_id", "band_hash", id_col, *(["src"] if has_src else [])
    )
    a, b = cold.alias("a"), cold.alias("b")
    cold_pairs = a.join(
        b,
        (F.col(f"a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("url_a"),
        F.col(f"b.{id_col}").alias("url_b"),
        *src_a,
    )

    # Hot buckets (> cap): a template cluster of m pages would emit
    # m(m−1)/2 pairs — 1.2·10^7 for m=5000, 5·10^11 for m=10^6. Since the
    # pair graph only feeds connected components, a spanning STAR per
    # bucket gives identical cluster membership at m edges instead:
    #   member → salt-group rep → bucket rep
    # (salted so no single task holds the whole bucket). Every star edge
    # is still exact-verified downstream, so a bucket mixing dissimilar
    # docs loses only edges that other, colder buckets re-derive.
    hot = tagged.filter(F.col("bucket_n") > cap)
    hot = hot.withColumn(
        "salt",
        F.pmod(F.xxhash64(id_col), F.ceil(F.col("bucket_n") / cap).cast("long")),
    )
    salt_rep = F.min(id_col).over(Window.partitionBy("band_id", "band_hash", "salt"))
    hot_src = [F.col("src")] if has_src else []
    hot_star = (
        hot.withColumn("_rep", salt_rep)
        .filter(F.col(id_col) != F.col("_rep"))
        .select(
            F.least(id_col, "_rep").alias("url_a"),
            F.greatest(id_col, "_rep").alias("url_b"),
            *hot_src,
        )
    )
    reps = hot.groupBy("band_id", "band_hash", "salt").agg(
        F.min(id_col).alias("salt_rep"),
        *([F.first("src").alias("src")] if has_src else []),
    )
    bucket_rep = reps.groupBy("band_id", "band_hash").agg(
        F.min("salt_rep").alias("bucket_rep")
    )
    chain = (
        reps.join(bucket_rep, ["band_id", "band_hash"])
        .filter(F.col("salt_rep") != F.col("bucket_rep"))
        .select(
            F.least("salt_rep", "bucket_rep").alias("url_a"),
            F.greatest("salt_rep", "bucket_rep").alias("url_b"),
            *hot_src,
        )
    )

    out = cold_pairs.unionByName(hot_star).unionByName(chain)
    if has_src:
        out = out.groupBy("url_a", "url_b").agg(
            F.array_sort(F.collect_set("src")).alias("srcs")
        )
    else:
        out = out.dropDuplicates(["url_a", "url_b"])
    if scratch_path is None:
        # materialize now so the persisted band table can be released —
        # candidate pairs are tiny next to the band table they came from
        out = out.localCheckpoint(eager=True)
        tagged.unpersist()
    return out


def jaccard_expr(a, b):
    """Exact Jaccard of two pre-distinct arrays, JVM-side."""
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def verify_pairs(
    pairs: DataFrame,
    signatures: DataFrame,
    threshold: float,
    id_col: str = "url",
    shingle_col: str = "shingles",
    kind: str | None = "minhash",
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs → (url_a, url_b,
    kind, score) for pairs with J ≥ threshold.

    ``kind=None`` passes through an existing ``kind`` column so several
    candidate sources can share ONE verification join (the shingle-set
    shuffle is the pairs stage's dominant cost — do it once).
    """
    sets = signatures.select(
        F.col(id_col).alias("_vid"), F.col(shingle_col).alias("_vset")
    )
    kind_col = F.col("kind") if kind is None else F.lit(kind)
    out = (
        pairs.join(sets.withColumnRenamed("_vid", "url_a").withColumnRenamed("_vset", "_set_a"), "url_a")
        .join(sets.withColumnRenamed("_vid", "url_b").withColumnRenamed("_vset", "_set_b"), "url_b")
        .withColumn("score", jaccard_expr(F.col("_set_a"), F.col("_set_b")))
        .filter(F.col("score") >= threshold)
        .select("url_a", "url_b", kind_col.alias("kind"), "score")
    )
    return out


def minhash_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "url",
    shingle_col: str = "shingles",
    sig_col: str = "minhash",
    bands: int = 32,
    rows: int = 4,
    cap: int = 256,
    threshold: float = 0.8,
    scratch_path: str | None = None,
) -> DataFrame:
    """signatures (with shingle sets + minhash) → verified near-dup pairs."""
    bands_df = explode_bands(signatures, sig_col=sig_col, id_col=id_col, bands=bands, rows=rows)
    cands = candidate_pairs(bands_df, id_col=id_col, cap=cap, scratch_path=scratch_path)
    return verify_pairs(cands, signatures, threshold, id_col=id_col, shingle_col=shingle_col)
