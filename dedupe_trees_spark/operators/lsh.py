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

        d = f"{conf_dir}/scratch_{uuid.uuid4().hex}"
        if "://" not in conf_dir:
            # driver-visible filesystem (local mode / shared mount): clean
            # up at interpreter exit so repeated calls (e.g. a scaling
            # sweep pointing the conf at /dev/shm) don't accumulate band
            # tables in RAM-backed tmpfs. Remote URIs (s3://, hdfs://)
            # are left to the cluster's scratch-retention policy.
            import atexit
            import shutil

            atexit.register(shutil.rmtree, d, ignore_errors=True)
        return d
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

    If ``bands_df`` carries an integer ``src`` column (bucket-provenance
    bit flag — the pipeline uses 1=minhash, 2=simhash, 4=substr with
    namespaced ``band_id`` ranges so buckets from different generators
    never merge), buckets from SEVERAL candidate generators share this
    ONE pass and the output gains ``srcs: int`` — the bit-OR of every
    proposing generator's flag. bit_or is a fixed-width, partially
    aggregatable agg; an earlier collect_set(string) variant forced the
    job's largest shuffle to carry array buffers.

    Plan shape — the pairs stage dominates full-job scaling, so its
    exchange count over the (huge) bucket table is engineered:

    1. ONE window pass computes per-bucket size and min-id — a single
       exchange on (band_id, band_hash) + sort — and spills to parquet
       scratch (``scratch_path``, or _default_scratch) so the three
       consumers below re-read instead of recomputing the explode.
       (The previous shape paid a groupBy-count + join-back here: two
       extra full-table exchanges.)
    2. Cold buckets (≤ cap): groupBy + collect_list + position-pair
       explode — one exchange, bounded at ``cap`` ids per aggregation
       buffer. Replaces a sort-merge self-join that exchanged and
       sorted the cold table twice; pair-set output is identical
       (all i<j positions of distinct ids per bucket).
    3. Hot buckets (> cap): a template cluster of m pages would emit
       m(m−1)/2 pairs — 5·10^11 from one 10^6-member bucket. A salted
       spanning STAR per bucket (member → salt-group rep → bucket min)
       keeps connected components seeing one component at ~m edges.
       The bucket rep is the pass-1 min-id, so only the salt-group
       window remains — over the (tiny) hot subset only. Star edges are
       still exact-verified downstream, so a bucket mixing dissimilar
       docs loses only edges that other, colder buckets re-derive.
    4. One final groupBy dedups pairs across all buckets and (when
       fused) all generators.
    """
    has_src = "src" in bands_df.columns
    spark = bands_df.sparkSession
    src_cols = ["src"] if has_src else []
    w_bucket = Window.partitionBy("band_id", "band_hash")
    tagged = bands_df.withColumn(
        "bucket_n", F.count(F.lit(1)).over(w_bucket)
    ).withColumn("bucket_min", F.min(id_col).over(w_bucket))
    if scratch_path is None:
        scratch_path = _default_scratch(spark)
    if scratch_path is not None:
        tagged.write.mode("overwrite").parquet(scratch_path)
        tagged = spark.read.parquet(scratch_path)
    else:
        tagged = tagged.persist()

    cold = tagged.filter(F.col("bucket_n") <= cap)
    grouped = cold.groupBy("band_id", "band_hash").agg(
        F.collect_list(id_col).alias("_ids"),
        *([F.first("src").alias("src")] if has_src else []),
    )
    # all position pairs i<j (ids are distinct within a bucket: each doc
    # contributes one row per band_id, and band_hash is a function of it)
    cold_pairs = (
        grouped.select(*src_cols, "_ids", F.posexplode("_ids").alias("_i", "_x"))
        .select(
            *src_cols,
            "_x",
            F.explode(
                F.slice("_ids", F.col("_i") + F.lit(2), F.size("_ids"))
            ).alias("_y"),
        )
        .select(
            F.least("_x", "_y").alias("url_a"),
            F.greatest("_x", "_y").alias("url_b"),
            *src_cols,
        )
    )

    hot = tagged.filter(F.col("bucket_n") > cap).withColumn(
        "salt",
        F.pmod(F.xxhash64(id_col), F.ceil(F.col("bucket_n") / cap).cast("long")),
    )
    hot = hot.withColumn(
        "_rep", F.min(id_col).over(Window.partitionBy("band_id", "band_hash", "salt"))
    )
    hot_star = hot.filter(F.col(id_col) != F.col("_rep")).select(
        F.least(id_col, "_rep").alias("url_a"),
        F.greatest(id_col, "_rep").alias("url_b"),
        *src_cols,
    )
    # exactly one row per salt group has id == salt rep; chaining it to
    # the bucket min keeps the whole bucket one component
    chain = hot.filter(
        (F.col(id_col) == F.col("_rep")) & (F.col("_rep") != F.col("bucket_min"))
    ).select(
        F.least("_rep", "bucket_min").alias("url_a"),
        F.greatest("_rep", "bucket_min").alias("url_b"),
        *src_cols,
    )

    out = cold_pairs.unionByName(hot_star).unionByName(chain)
    if has_src:
        out = out.groupBy("url_a", "url_b").agg(F.bit_or("src").alias("srcs"))
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
