"""Driver-contract queries: each engine query paired with an ANSI-SQL
oracle that DuckDB runs over the same parquet tables.

Conventions (driver compare is row-count + schema + order-insensitive
value-hash, columns sorted by name):

- every computed column is aliased IDENTICALLY in Spark and SQL;
- no floating-point aggregates — money/quantity sums go through
  DECIMAL(18,2) so Spark and DuckDB produce bit-identical values
  regardless of summation order;
- no raw timestamps in outputs (cast to DATE/STRING when needed);
- the synthetic page mapping (documents → url/source_order) is the same
  deterministic expression in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import fingerprint_md5, tokens
from dedupe_trees_spark.operators import resolve as R

# ---------------------------------------------------------------------------
# helpers


# a fixture table at or below this size is fanned out to the cores on
# load: the driver writes each table as ONE parquet file with ONE row
# group, and a row group is the minimum scan-split unit, so every
# map-side stage rooted at such a scan runs on a single core no matter
# what maxPartitionBytes says (guide §2.5 "one huge unsplittable
# file — repartition immediately after the read"). The round-robin
# exchange costs ~0.1-0.3 s at these sizes and parallelizes every
# downstream UDF/explode; big tables (many row groups) split naturally
# and skip it, so nothing here shuffles GB-scale inputs.
_FANOUT_MAX_BYTES = 256 << 20

# …and a floor (r06 second pass): KB-sized dimension tables
# (region/nation/supplier at every SF) gain nothing from 32 near-empty
# partitions — the exchange plus 32 task launches cost MORE than any
# parallelism they buy, and several queries load 2-3 such tables each.
# Measured at sf0.1 (9-query dimension-table sweep, 3 warm reps):
# ~4.1-4.4 s → ~3.3-3.5 s with the floor. 64 KB keeps every table a
# UDF ever scans (documents, embeddings, events, part, customer …)
# above the floor, so the §8 fan-out behavior is unchanged where it
# matters.
_FANOUT_MIN_BYTES = 64 << 10


def _input_bytes(path: str) -> int | None:
    import os

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total
    except OSError:
        return None


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    size = _input_bytes(path)
    if size is not None and _FANOUT_MIN_BYTES <= size <= _FANOUT_MAX_BYTES:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _materialize(df: DataFrame) -> DataFrame:
    """Compute a multiply-consumed intermediate ONCE (EAGER
    localCheckpoint): self-joins and size/score join-backs otherwise
    replicate the producing subtree per consumer — the capped-gram core
    re-ran its scan + shingle UDF 8× per query (plan-verified, r06).
    localCheckpoint (not persist) on purpose: blocks belong to this
    DataFrame object only, so nothing is shared across separately-built
    queries — every bench/oracle invocation still computes from the
    parquet inputs. EAGER on purpose (r06 second pass): a lazy
    checkpoint is materialized by whichever consumer job runs first,
    and Spark launches broadcast-exchange builds CONCURRENTLY — each
    racing consumer recomputes the full subtree before any of them
    registers the blocks (measured ~2× on every query in this family
    at sf0.1, and 2.4–3.2× on the 1M lang-id path). Eager runs one job
    at dataframe-construction time — still inside every timed/oracled
    window, which opens at query build."""
    return df.localCheckpoint(eager=True)


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver `documents` fixture into the pages shape
    (BASELINE.json input_hint) with deterministic lineage columns.

    Mirrored 1:1 by the `_PAGES_SQL` CTE below — keep in sync.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example/d"),
            F.col("doc_id").cast("string"),
            F.lit(".html"),
        ).alias("url"),
        F.col("doc_id"),
        F.col("text"),
        F.col("lang"),
        F.col("source"),
        F.substring("source", 4, 10).cast("int").alias("source_order"),
    )


_PAGES_SQL = """
  SELECT 'https://' || source || '.example/d' || CAST(doc_id AS VARCHAR) || '.html' AS url,
         doc_id, text, lang, source,
         CAST(substr(source, 4) AS INT) AS source_order
  FROM documents
"""


# ---------------------------------------------------------------------------
# M1 — exact dedup, fingerprints, resolver windows, sinks, core OLAP ops


def q_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint + basic text stats per document (SURVEY §2.1 R2)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        fingerprint_md5("text").alias("fingerprint"),
        F.length("text").alias("text_len"),
        F.size(tokens("text")).alias("n_tokens"),
    )


SQL_CONTENT_FINGERPRINT = """
SELECT doc_id,
       md5(text) AS fingerprint,
       length(text) AS text_len,
       len(string_split(text, ' ')) AS n_tokens
FROM documents
"""


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate sets by content (SURVEY §2.1 R3: FileCatalog groups).

    Engine groups on the content fingerprint; oracle groups on the text
    itself — identical output because equal fingerprint ⇔ equal text.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(fingerprint_md5("text").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("first_member"),
        )
        .filter(F.col("dup_count") > 1)
    )


SQL_EXACT_DUP_GROUPS = """
SELECT md5(text) AS fingerprint,
       count(*) AS dup_count,
       min(doc_id) AS first_member
FROM documents
GROUP BY md5(text)
HAVING count(*) > 1
"""


def q_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolver-chain canonical selection as a window rank (R4+R8/R10).

    Duplicate-set proxy: language groups (driver fixture has no exact
    dups); resolver chain = source_order → arbitrary. This is the same
    `resolve()` operator the dedup pipeline uses on real components.
    """
    pages = documents_as_pages(spark, sf_dir).withColumn(
        "component_id", F.col("lang")
    )
    resolved = R.resolve(pages, ["source_order", "arbitrary"])
    return resolved.filter("is_canonical").select(
        "component_id", "url", "source_order"
    )


SQL_CANONICAL_PICK = f"""
WITH pages AS ({_PAGES_SQL})
SELECT component_id, url, source_order FROM (
  SELECT lang AS component_id, url, source_order,
         row_number() OVER (PARTITION BY lang ORDER BY source_order ASC, url ASC) AS rn
  FROM pages
) WHERE rn = 1
"""


def q_rank_ties_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-ties semantics (invariant I2): rank() window, all rank-1 rows
    survive when the chain has no arbitrary terminal."""
    pages = documents_as_pages(spark, sf_dir).withColumn(
        "component_id", F.col("lang")
    )
    resolved = R.resolve(pages, ["source_order"])
    return resolved.filter("is_canonical").select("component_id", "url")


SQL_RANK_TIES_SURVIVORS = f"""
WITH pages AS ({_PAGES_SQL})
SELECT component_id, url FROM (
  SELECT lang AS component_id, url,
         rank() OVER (PARTITION BY lang ORDER BY source_order ASC) AS rk
  FROM pages
) WHERE rk = 1
"""


def q_removal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-only sink (R13): manifest of non-survivors, plus the
    delete-sink anti-join (R11) re-deriving the kept set size."""
    pages = documents_as_pages(spark, sf_dir).withColumn(
        "component_id", F.col("lang")
    )
    resolved = R.resolve(pages, ["source_order", "arbitrary"])
    removed = R.removals(resolved)
    return removed.select("url", "component_id")


SQL_REMOVAL_MANIFEST = f"""
WITH pages AS ({_PAGES_SQL})
SELECT url, component_id FROM (
  SELECT lang AS component_id, url,
         row_number() OVER (PARTITION BY lang ORDER BY source_order ASC, url ASC) AS rn
  FROM pages
) WHERE rn > 1
"""


def q_path_depth_copy_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-depth (R5) and copy-pattern (R7) resolver keys as columns."""
    pages = documents_as_pages(spark, sf_dir)
    return pages.select(
        "url",
        R.path_depth("url").alias("path_depth"),
        R.is_copy_pattern("url").alias("copy_flag"),
    )


SQL_PATH_DEPTH_COPY_FLAGS = f"""
WITH pages AS ({_PAGES_SQL})
SELECT url,
       len(string_split(regexp_replace(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*/?', ''), '/')) AS path_depth,
       CASE WHEN regexp_matches(lower(split_part(url, '/', -1)), '^copy(\\s*\\(\\d+\\))?\\s+of\\s+')
              OR regexp_matches(lower(split_part(url, '/', -1)), '\\s+copy(\\s*\\d+)?(\\.[^./]*)?$')
              OR regexp_matches(split_part(url, '/', -1), '\\s*\\(\\d+\\)(\\.[^./]*)?$')
            THEN 1 ELSE 0 END AS copy_flag
FROM pages
"""


def q_mod_date_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mod_date resolver (R6: ModificationDateDuplicateResolver — oldest
    wins) driven through the same resolve() chain machinery: dup-set
    proxy = o_custkey, timestamp key = o_orderdate, chain
    (mod_date, arbitrary). Output dates serialized to 'yyyy-MM-dd'
    strings: DuckDB DATE materializes as datetime64 in pandas, which
    hashes differently from Spark's date objects."""
    o = load(spark, sf_dir, "orders")
    df = o.select(
        F.col("o_custkey").alias("component_id"),
        F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")).alias("url"),
        F.col("o_orderdate").alias("warc_ts"),
    )
    resolved = R.resolve(df, ["mod_date", "arbitrary"])
    return resolved.filter("is_canonical").select(
        "component_id", "url", F.date_format("warc_ts", "yyyy-MM-dd").alias("mod_date")
    )


SQL_MOD_DATE_RESOLUTION = """
SELECT component_id, url, mod_date FROM (
  SELECT o_custkey AS component_id,
         'order:' || CAST(o_orderkey AS VARCHAR) AS url,
         strftime(o_orderdate, '%Y-%m-%d') AS mod_date,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, 'order:' || CAST(o_orderkey AS VARCHAR) ASC
         ) AS rn
  FROM orders
) WHERE rn = 1
"""


def q_dup_set_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-set size histogram (per-lang proxy sets)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("set_size"))
        .groupBy("set_size")
        .agg(F.count(F.lit(1)).alias("n_sets"))
    )


SQL_DUP_SET_HISTOGRAM = """
SELECT set_size, count(*) AS n_sets FROM (
  SELECT lang, count(*) AS set_size FROM documents GROUP BY lang
) GROUP BY set_size
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style aggregation (agg inventory coverage). DECIMAL sums
    for cross-engine bit-identical results."""
    li = load(spark, sf_dir, "lineitem")
    dec = "decimal(18,2)"
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double").alias("sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice").cast(dec)
                    * (F.lit(1).cast(dec) - F.col("l_discount").cast(dec))
                ).cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per measure: sources ranked by document count (sort+limit)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .limit(10)
    )


SQL_TOP_SOURCES = """
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
ORDER BY n_docs DESC, source ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "content_fingerprint": q_content_fingerprint,
    "exact_dup_groups": q_exact_dup_groups,
    "canonical_pick": q_canonical_pick,
    "rank_ties_survivors": q_rank_ties_survivors,
    "removal_manifest": q_removal_manifest,
    "path_depth_copy_flags": q_path_depth_copy_flags,
    "mod_date_resolution": q_mod_date_resolution,
    "dup_set_histogram": q_dup_set_histogram,
    "pricing_summary": q_pricing_summary,
    "top_sources": q_top_sources,
}

ORACLES: dict[str, str] = {
    "content_fingerprint": SQL_CONTENT_FINGERPRINT,
    "exact_dup_groups": SQL_EXACT_DUP_GROUPS,
    "canonical_pick": SQL_CANONICAL_PICK,
    "rank_ties_survivors": SQL_RANK_TIES_SURVIVORS,
    "removal_manifest": SQL_REMOVAL_MANIFEST,
    "path_depth_copy_flags": SQL_PATH_DEPTH_COPY_FLAGS,
    "mod_date_resolution": SQL_MOD_DATE_RESOLUTION,
    "dup_set_histogram": SQL_DUP_SET_HISTOGRAM,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_sources": SQL_TOP_SOURCES,
}


# ---------------------------------------------------------------------------
# M3/M4 — near-dup detection, substring dedup, full dedup flagship

# Shared CTE: distinct 3-word shingles per document + set sizes + pairwise
# intersection counts — the relational brute-force exact-Jaccard oracle.
_JACCARD_SQL_CTES = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
  grams AS (
    -- stride-1 3-word shingles; docs with <3 tokens contribute one
    -- whole-text shingle, matching the engine's word_shingles semantics
    -- (functions/text.py word_shingles: short docs still participate)
    SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
    FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i FROM toks)
    UNION
    SELECT doc_id, array_to_string(arr, ' ') AS g FROM toks WHERE len(arr) < 3
  ),
  sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jpairs AS (
    SELECT i.doc_a, i.doc_b,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
  )
"""


def _doc_shingle_sets(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Distinct k-gram shingle-hash sets via the pipeline's fast path:
    JVM token hashing + NumPy gram mixing (shingle_set_udf). The pure-JVM
    shingle_hashes() alternative builds k-gram STRINGS inside a
    higher-order lambda — O(n²) after Catalyst inlines the token array
    (functions/text.py token_hashes docstring) — measured ~5× slower on
    these queries at sf0.1. Set cardinalities/intersections are
    identical w.h.p. (64-bit mixed hashes), so exact-Jaccard values and
    the string-shingle DuckDB oracles are unaffected."""
    from dedupe_trees_spark.functions.minhash import shingle_set_udf
    from dedupe_trees_spark.functions.text import token_hashes

    # consumers fan out (signature + bands + verify sides) — compute the
    # shingle UDF once per query instead of once per consumer subtree
    return _materialize(
        load(spark, sf_dir, "documents").select(
            "doc_id", shingle_set_udf(k)(token_hashes("text")).alias("shingles")
        )
    )


NGRAM_DF_CAP = 64


def _capped_gram_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared relational core of the exact n-gram family: DF-capped
    shingle inverted index → pairwise intersection counts → per-pair
    (doc_a, doc_b, c, na, nb) ready for Jaccard/containment arithmetic.

    Stop-shingle guard: shingles appearing in more than NGRAM_DF_CAP
    documents are dropped from the index — and from the set sizes — on
    BOTH engine and oracle sides, so the semantics stay a well-defined
    (filtered-space) measure. A shingle shared by m docs emits m² join
    rows; uncapped, one boilerplate phrase across 10^6 pages is 10^12
    rows from a single key. Fixture max DF is 25 (sf0.1), so results are
    unchanged at test scale.

    The DF count is a groupBy + join-back rather than a count window:
    the window formulation is ~1.7× faster at sandbox scale (one
    shuffle instead of two) but puts EVERY row of a hot gram into one
    task before dropping it — the exact skew this cap exists to guard —
    while groupBy gets map-side partial aggregation."""
    sets = _doc_shingle_sets(spark, sf_dir)
    # all_grams feeds the DF count AND the capped index; exploded feeds
    # sizes and BOTH self-join sides — materialize each once (r06:
    # the un-materialized plan carried 8 copies of scan+shingle-UDF)
    all_grams = _materialize(
        sets.select("doc_id", F.explode("shingles").alias("g"))
    )
    rare = (
        all_grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("gram_df"))
        .filter(F.col("gram_df") <= NGRAM_DF_CAP)
        .select("g")
    )
    exploded = _materialize(all_grams.join(rare, "g"))
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs (J ≥ 0.8) over the shared
    DF-capped inverted-index core (`_capped_gram_pair_scores` — the
    skew guard and its rationale live there)."""
    return (
        _capped_gram_pair_scores(spark, sf_dir)
        .withColumn("jaccard", F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")))
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )


# Capped variant: same pipeline over the DF-filtered shingle space
# (mirrors NGRAM_DF_CAP on the engine side).
_JACCARD_CAPPED_CTES = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
  grams0 AS (
    SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
    FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i FROM toks)
    UNION
    SELECT doc_id, array_to_string(arr, ' ') AS g FROM toks WHERE len(arr) < 3
  ),
  grams AS (
    SELECT doc_id, g FROM grams0 QUALIFY count(*) OVER (PARTITION BY g) <= 64
  ),
  sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
    FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  ),
  jpairs AS (
    SELECT i.doc_a, i.doc_b,
           CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.8
  )
"""

SQL_NGRAM_JACCARD_PAIRS = f"""
WITH {_JACCARD_CAPPED_CTES}
SELECT doc_a, doc_b, jaccard FROM jpairs
"""


def q_minhash_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash→LSH→verified near-dup pairs. The oracle is the exact
    brute-force Jaccard SQL — a match PROVES 100% LSH recall on this
    dataset at the configured signature config (128 perms, 32×4 bands;
    precision is exact by construction since candidates are verified)."""
    from dedupe_trees_spark.operators.lsh import add_signature, minhash_lsh_pairs

    sets = _doc_shingle_sets(spark, sf_dir)
    sigs = add_signature(sets, num_perm=128, seed=42)
    pairs = minhash_lsh_pairs(
        sigs, id_col="doc_id", bands=32, rows=4, cap=256, threshold=0.8
    )
    return pairs.select(
        F.col("url_a").alias("doc_a"),
        F.col("url_b").alias("doc_b"),
        F.col("score").alias("jaccard"),
    )


SQL_MINHASH_LSH_DUP_PAIRS = f"""
WITH {_JACCARD_SQL_CTES}
SELECT doc_a, doc_b, jaccard FROM jpairs
"""


def q_substring_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs sharing an exact 64-char substring (stride-1 grams on both
    sides — true substring semantics, fully relational)."""
    from dedupe_trees_spark.operators.substring import substring_pairs_exact

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = substring_pairs_exact(d, id_col="doc_id", k=64, cap=4096)
    return pairs.select(F.col("url_a").alias("doc_a"), F.col("url_b").alias("doc_b"))


SQL_SUBSTRING_DUP_PAIRS = """
WITH grams AS (
  SELECT DISTINCT doc_id, substr(text, i, 64) AS g
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 63)) AS i
        FROM documents WHERE length(text) >= 64)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
"""


def q_substring_extent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array exact-substring extents (the north-star operator):
    pairs sharing a verbatim run ≥ 64 chars, with the EXACT longest
    shared run length. Engine: winnow candidates → per-pair generalized
    suffix array (NumPy prefix doubling). Oracle: stride-1 64-gram
    position join → longest consecutive diagonal chain (+63) — an exact
    relational twin of the LCS length for every qualifying pair."""
    from dedupe_trees_spark.operators.substring import substring_extent_pairs

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = substring_extent_pairs(d, id_col="doc_id", min_run=64, k=24, cap=4096)
    return pairs.select(
        F.col("url_a").alias("doc_a"), F.col("url_b").alias("doc_b"), "max_run"
    )


SQL_SUBSTRING_EXTENT_PAIRS = """
WITH g AS (
  SELECT doc_id, i, substr(text, i, 64) AS gram
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 63)) AS i
        FROM documents WHERE length(text) >= 64)
),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.i AS ia, b.i AS ib
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
runs AS (
  SELECT doc_a, doc_b, ia,
         ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - ib ORDER BY ia) AS grp,
         ia - ib AS diag
  FROM m
),
chains AS (
  SELECT doc_a, doc_b, count(*) + 63 AS run_len
  FROM runs GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b, CAST(max(run_len) AS BIGINT) AS max_run
FROM chains GROUP BY doc_a, doc_b
"""


def q_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-≤3 candidate pairs, Jaccard-verified at 0.8.
    (No SQL equality twin — simhash is not SQL-expressible; driver
    records a rows-only check. Correctness is covered by pytest
    unit/recall tests plus a CONTAINMENT oracle:
    tests/test_diff_harness.py asserts every emitted pair is in the
    brute-force J≥0.8 set with the identical Jaccard value.)

    Row-count drift adjudication (12 rows in round 1 → 9 in round 2):
    round 1 emitted Hamming-verified candidates only; round 2 added the
    exact-Jaccard ≥ 0.8 filter, dropping 3 Hamming-close-but-J<0.8
    pairs — a precision improvement, now pinned by the containment test
    so any future drift fails CI instead of passing unadjudicated.
    """
    from dedupe_trees_spark.operators.lsh import verify_pairs
    from dedupe_trees_spark.operators.simhash_join import add_simhash, simhash_pairs

    sets = _doc_shingle_sets(spark, sf_dir)
    sims = add_simhash(sets)
    cands = simhash_pairs(sims, id_col="doc_id", max_hamming=3, cap=256)
    verified = verify_pairs(
        cands.select(F.col("url_a"), F.col("url_b")),
        sets.withColumnRenamed("doc_id", "url"),
        threshold=0.8,
        kind="simhash",
    )
    return verified.select(
        F.col("url_a").alias("doc_a"), F.col("url_b").alias("doc_b"),
        F.col("score").alias("jaccard"),
    )


def q_dedup_canonical_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: full near-dup clustering + resolver-chain resolution.

    exact-hash edges ∪ LSH-verified Jaccard-0.8 edges → connected
    components → window resolution (source_order, arbitrary). Oracle:
    recursive-CTE transitive closure over the brute-force Jaccard graph
    with the same window — an end-to-end SQL twin of the whole engine.
    Component ids are not exposed (engine uses min-url labels, oracle
    min-doc_id); per-doc cluster_size + is_canonical are label-free.
    """
    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.exact import exact_edges
    from dedupe_trees_spark.operators.lsh import add_signature, minhash_lsh_pairs
    from dedupe_trees_spark.operators.resolve import resolve

    from dedupe_trees_spark.functions.minhash import shingle_set_udf
    from dedupe_trees_spark.functions.text import token_hashes

    pages = documents_as_pages(spark, sf_dir)
    # sets fans out into exact edges, signatures, verify and resolve —
    # one shingle-UDF pass instead of one per consumer subtree
    sets = _materialize(
        pages.select(
            "url", "doc_id", "source_order",
            F.xxhash64("text").alias("content_hash"),
            shingle_set_udf(3)(token_hashes("text")).alias("shingles"),
        )
    )
    exact = exact_edges(sets, id_col="url", hash_col="content_hash")
    sigs = add_signature(sets, num_perm=128, seed=42)
    near = minhash_lsh_pairs(sigs, id_col="url", bands=32, rows=4, cap=256, threshold=0.8)
    edges = exact.select("url_a", "url_b").unionByName(near.select("url_a", "url_b"))
    comps = assign_components(sets.select("url"), edges, id_col="url")
    resolved = resolve(
        sets.select("url", "doc_id", "source_order").join(comps, "url"),
        ["source_order", "arbitrary"],
    )
    w = Window.partitionBy("component_id")
    return resolved.select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.col("is_canonical"),
    )


SQL_DEDUP_CANONICAL_FULL = f"""
WITH RECURSIVE {_JACCARD_SQL_CTES},
pages AS ({_PAGES_SQL}),
exact_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
),
alledges AS (
  SELECT doc_a, doc_b FROM jpairs
  UNION SELECT doc_a, doc_b FROM exact_pairs
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM alledges
  UNION SELECT doc_b, doc_a FROM alledges
),
reach(u, v) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
comp AS (SELECT u AS doc_id, min(v) AS root FROM reach GROUP BY u),
labeled AS (
  SELECT p.doc_id, p.url, p.source_order, c.root
  FROM pages p JOIN comp c ON p.doc_id = c.doc_id
)
SELECT doc_id,
       count(*) OVER (PARTITION BY root) AS cluster_size,
       (row_number() OVER (PARTITION BY root ORDER BY source_order ASC, url ASC) = 1)
         AS is_canonical
FROM labeled
"""


# ---------------------------------------------------------------------------
# Training-pipeline operators: text analysis, similarity search, multimodal,
# sessionization


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word/punct chunks."""
    from dedupe_trees_spark.operators.textstats import token_count, word_token_count

    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        word_token_count("text").alias("word_tokens"),
    )


SQL_TOKEN_STATS = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       CAST(len(list_filter(regexp_split_to_array(text, '[^0-9A-Za-z]+'), x -> x != ''))
            + length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g')) AS INT) AS word_tokens
FROM documents
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/digit/punct/stopword features + composite."""
    from dedupe_trees_spark.operators.textstats import quality_score

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = quality_score(d)
    return out.select(
        "doc_id", "n_chars", "n_tokens",
        F.round("digit_ratio", 8).alias("digit_ratio"),
        F.round("punct_ratio", 8).alias("punct_ratio"),
        F.round("stopword_ratio", 8).alias("stopword_ratio"),
        F.round("quality", 8).alias("quality"),
    )


SQL_QUALITY_SCORES = """
WITH feats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
         length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g')) AS punct,
         CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS INT)
       + CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5 AS INT)
       + CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4 AS INT)
       + CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' is ', ''))) / 4 AS INT) AS stop
  FROM documents
), scored AS (
  SELECT doc_id, n_chars, n_tokens,
         CAST(digits AS DOUBLE) / greatest(n_chars, 1) AS digit_ratio,
         CAST(punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
         CAST(stop AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
         (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END
          + (1.0 - least(CAST(digits AS DOUBLE) / greatest(n_chars, 1) * 4, 1.0))
          + (1.0 - least(CAST(punct AS DOUBLE) / greatest(n_chars, 1) * 4, 1.0))) / 3.0 AS quality
  FROM feats
)
SELECT doc_id, n_chars, n_tokens,
       round(digit_ratio, 8) AS digit_ratio,
       round(punct_ratio, 8) AS punct_ratio,
       round(stopword_ratio, 8) AS stopword_ratio,
       round(quality, 8) AS quality
FROM scored
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (stopword-marker argmax) vs labeled lang."""
    from dedupe_trees_spark.operators.textstats import lang_id

    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lang_id("text").alias("pred_lang"))


def _sql_marker(lang_words: list[str]) -> str:
    parts = [
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) / {len(w) + 2} AS INT)"
        for w in lang_words
    ]
    return " + ".join(parts)


SQL_LANG_ID = f"""
WITH padded AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
scores AS (
  SELECT doc_id, lang,
         {_sql_marker(['der', 'die', 'und', 'das'])} AS s_de,
         {_sql_marker(['the', 'and', 'of', 'is'])} AS s_en,
         {_sql_marker(['el', 'los', 'que', 'y'])} AS s_es,
         {_sql_marker(['le', 'la', 'les', 'et'])} AS s_fr,
         {_sql_marker(['de', 'shi', 'le', 'zai'])} AS s_zh
  FROM padded
)
SELECT doc_id, lang,
       CASE
         WHEN s_zh > greatest(s_de, s_en, s_es, s_fr, 0) THEN 'zh'
         WHEN s_fr > greatest(s_de, s_en, s_es, 0) THEN 'fr'
         WHEN s_es > greatest(s_de, s_en, 0) THEN 'es'
         WHEN s_en > greatest(s_de, 0) THEN 'en'
         WHEN s_de > 0 THEN 'de'
         ELSE 'und'
       END AS pred_lang
FROM scores
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 8."""
    from dedupe_trees_spark.operators.similarity import brute_force_topk

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 8)
    out = brute_force_topk(e, q, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk"
    )


SQL_COSINE_TOPK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id,
         CASE WHEN list_sum(list_transform(q.qemb, x -> x * x)) > 0
               AND list_sum(list_transform(e.emb, x -> x * x)) > 0
              THEN list_dot_product(q.qemb, e.emb)
                   / (sqrt(list_sum(list_transform(q.qemb, x -> x * x)))
                      * sqrt(list_sum(list_transform(e.emb, x -> x * x))))
              ELSE 0.0 END AS cos_raw
  FROM q, e WHERE e.vec_id != q.query_id
), ranked AS (
  SELECT query_id, vec_id, cos_raw,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, round(cos_raw, 6) AS cos_sim, rnk
FROM ranked WHERE rnk <= 5
"""


def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-typed table aggregation: per-label counts + id range."""
    e = load(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("vec_id").alias("min_id"),
        F.max("vec_id").alias("max_id"),
    )


SQL_EMBEDDING_LABEL_STATS = """
SELECT label, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
FROM embeddings GROUP BY label
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via lag + gap>30min cumsum (window-op coverage)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


SQL_SESSIONIZE_EVENTS = """
WITH marked AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM marked GROUP BY user_id
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: synthesize an html binary, decode metadata
    through the mapInPandas media stage (decode itself is a deterministic
    stub; schema/batching is the real pattern)."""
    from dedupe_trees_spark.operators.multimodal import extract_media_meta

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("payload"),
    )
    meta = extract_media_meta(d, binary_col="payload")
    return meta.select(
        F.col("url").cast("bigint").alias("doc_id"),
        "byte_len",
        F.col("media_type"),
    )


SQL_MULTIMODAL_META = """
SELECT doc_id, octet_length(encode(text)) + 26 AS byte_len, 'binary' AS media_type
FROM documents
"""


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage (video-pipeline pattern): binaries split into
    256-byte frames, every 2nd frame sampled via mapInPandas (1 row → N
    rows), aggregated per doc. The oracle re-derives frame counts and
    sampled byte totals arithmetically from the payload length."""
    from dedupe_trees_spark.operators.multimodal import sample_frames

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(
            F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
            "utf-8",
        ).alias("payload"),
    )
    frames = sample_frames(d, binary_col="payload", frame_size=256, every=2)
    return frames.groupBy(F.col("url").cast("bigint").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_len").alias("sampled_bytes"),
    )


SQL_MEDIA_FRAME_STATS = """
WITH p AS (SELECT doc_id, octet_length(encode(text)) + 26 AS len FROM documents),
f AS (
  SELECT doc_id, len,
         unnest(generate_series(0, CAST(ceil(len / 256.0) AS INT) - 1, 2)) AS i
  FROM p
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(least(256, len - i * 256)) AS BIGINT) AS sampled_bytes
FROM f GROUP BY doc_id
"""


def q_incremental_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-index parity, oracle-checked end-to-end: documents
    split pseudo-randomly into two batches, a dedup index initialized on
    batch 1 (`plans/incremental.init_index`), batch 2 folded in with
    `incremental_update` — and the updated canonical table is compared
    against the SAME full-corpus SQL oracle as the flagship
    (`SQL_DEDUP_CANONICAL_FULL`). Equality proves the delta path's
    candidate join against the persisted bucket index, the subgraph
    connected components, and the touched-cluster re-resolution
    reproduce a from-scratch run exactly (the parity theorem in
    plans/incremental.py, also pytest-asserted with all four generators
    in tests/test_incremental.py). exact + minhash generators only —
    the oracle's edge semantics; resolver (source_order, url) matches
    the oracle window. The scratch index lives under a fresh /tmp dir
    (the returned DataFrame reads its parquet lazily, so it is not
    cleaned up here)."""
    import tempfile

    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.io import read_stage
    from dedupe_trees_spark.plans.incremental import incremental_update, init_index

    pages = documents_as_pages(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="incr_contract_")
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).write.parquet(
        f"{work}/b1"
    )
    cfg = PipelineConfig(
        input_path=f"{work}/b1",
        ckpt_dir=f"{work}/idx",
        enable_simhash=False,
        enable_substring=False,
        resolvers=("source_order", "arbitrary"),
    )
    init_index(spark, cfg)
    incremental_update(
        spark, cfg, pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1), "b2"
    )
    canon = read_stage(spark, cfg.ckpt_dir, "canonical")
    w = Window.partitionBy("component_id")
    return canon.join(pages.select("url", "doc_id"), "url").select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        F.col("is_canonical"),
    )


QUERIES.update(
    {
        "incremental_canonical": q_incremental_canonical,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_lsh_dup_pairs": q_minhash_lsh_dup_pairs,
        "substring_dup_pairs": q_substring_dup_pairs,
        "substring_extent_pairs": q_substring_extent_pairs,
        "simhash_dup_pairs": q_simhash_dup_pairs,
        "dedup_canonical_full": q_dedup_canonical_full,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "cosine_topk": q_cosine_topk,
        "embedding_label_stats": q_embedding_label_stats,
        "sessionize_events": q_sessionize_events,
        "multimodal_meta": q_multimodal_meta,
        "media_frame_stats": q_media_frame_stats,
    }
)

ORACLES.update(
    {
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
        "minhash_lsh_dup_pairs": SQL_MINHASH_LSH_DUP_PAIRS,
        "substring_dup_pairs": SQL_SUBSTRING_DUP_PAIRS,
        "substring_extent_pairs": SQL_SUBSTRING_EXTENT_PAIRS,
        # simhash_dup_pairs: deliberately no oracle (rows-only check)
        "dedup_canonical_full": SQL_DEDUP_CANONICAL_FULL,
        # the incremental path must reproduce the full-corpus result —
        # the flagship's oracle IS its oracle
        "incremental_canonical": SQL_DEDUP_CANONICAL_FULL,
        "token_stats": SQL_TOKEN_STATS,
        "quality_scores": SQL_QUALITY_SCORES,
        "lang_id": SQL_LANG_ID,
        "cosine_topk": SQL_COSINE_TOPK,
        "embedding_label_stats": SQL_EMBEDDING_LABEL_STATS,
        "sessionize_events": SQL_SESSIONIZE_EVENTS,
        "multimodal_meta": SQL_MULTIMODAL_META,
        "media_frame_stats": SQL_MEDIA_FRAME_STATS,
    }
)


def q_winnow_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint substring pairs (the 100-TB scale path; the
    stride-1 exact query above is its oracle-checked sibling). Rows-only
    check: winnowing guarantees detection of runs ≥ k+w−1 = 96 chars but
    also (correctly) finds shorter shared k-grams, so it is a superset of
    a fixed-length SQL predicate — pytest proves winnow ⊆ exact-gram."""
    from dedupe_trees_spark.operators.substring import substring_pairs_winnow

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = substring_pairs_winnow(d, id_col="doc_id", k=48, w=49, cap=4096)
    return pairs.select(F.col("url_a").alias("doc_a"), F.col("url_b").alias("doc_b"))


def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: SRP-bucketed candidates + exact cosine re-rank.
    Rows-only check (approximate by design); recall vs the brute-force
    twin is asserted in pytest on planted neighbors."""
    from dedupe_trees_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 8)
    out = lsh_topk(e, q, k=5, dim=64, n_bits=12, n_tables=6)
    return out.select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk")


def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via an IVF-Flat inverted index (partition-based
    scale path; the SRP-LSH path is ``embedding_lsh_topk``). Rows-only
    check; the containment oracle asserts every returned cos_sim equals
    the exact cosine, and planted-neighbor recall is pytest-asserted."""
    from dedupe_trees_spark.operators.similarity import ivf_topk

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 8)
    out = ivf_topk(e, q, k=5, n_cells=16, nprobe=4)
    return out.select("query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rnk")


def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (dedup family): every unordered
    pair with exact cosine ≥ 0.35, blocked through SRP-LSH buckets so
    the join is bucket-equi (see ``neardup_pairs`` for the scale shape).

    Oracle equality vs brute-force SQL holds because the fixed-seed SRP
    tables (b=4, t=64, seed=42) were verified to capture ALL qualifying
    pairs at sf0.001/0.01/0.1 (NumPy exhaustive check; the emitted
    cos_sim itself is always exact, LSH only gates which pairs are
    scored) — same contract structure as ``minhash_lsh_dup_pairs`` vs
    its brute-force-Jaccard oracle. The fixture's random embeddings top
    out at cosine ~0.5, hence the loose 0.35 threshold and the
    few-bits/many-tables tuning; production near-dup (tau ≥ 0.9) uses
    the operator's defaults (b=16) for sub-quadratic candidates."""
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    out = neardup_pairs(e, tau=0.35, dim=64, n_bits=4, n_tables=64, seed=42)
    return out.select(
        F.col("id_a").alias("vec_a"),
        F.col("id_b").alias("vec_b"),
        F.round("cos_sim", 6).alias("cos_sim"),
    )


SQL_EMBEDDING_NEARDUP_PAIRS = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CASE WHEN list_sum(list_transform(a.emb, x -> x * x)) > 0
               AND list_sum(list_transform(b.emb, x -> x * x)) > 0
              THEN list_dot_product(a.emb, b.emb)
                   / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.emb, x -> x * x))))
              ELSE 0.0 END AS cos_raw
  FROM e a, e b WHERE a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos_raw, 6) AS cos_sim
FROM scored WHERE cos_raw >= 0.35
"""


QUERIES.update(
    {
        "winnow_substring_pairs": q_winnow_substring_pairs,
        "embedding_lsh_topk": q_embedding_lsh_topk,
        "embedding_ivf_topk": q_embedding_ivf_topk,
        "embedding_neardup_pairs": q_embedding_neardup_pairs,
    }
)

ORACLES.update({"embedding_neardup_pairs": SQL_EMBEDDING_NEARDUP_PAIRS})


# ---------------------------------------------------------------------------
# M5 (r4, late) — paragraph-level dedup, repetition quality, URL canonicals


def _chunk_paras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, pos, para) token-chunk paragraphs (chunk=8).

    The fixture corpus is single-line, so the paragraph unit for the
    contract is a fixed 8-token chunk — `_PARAS_SQL` is the 1:1 DuckDB
    twin (list slicing over generate_series). Real web text uses
    `explode_paragraphs` on "\\n\\n" instead; all downstream operators
    are separator-agnostic.
    """
    from dedupe_trees_spark.operators.paragraphs import token_chunk_paragraphs

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return token_chunk_paragraphs(d, chunk=8)


_PARAS_SQL = """
  toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
  paras AS (
    SELECT doc_id, CAST(i AS INT) AS pos,
           array_to_string(arr[(i*8+1):(i*8+8)], ' ') AS para
    FROM (SELECT doc_id, arr,
                 unnest(generate_series(0, CAST(ceil(len(arr)/8.0) AS INT) - 1)) AS i
          FROM toks)
  )
"""


def q_paragraph_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate census: paragraphs occurring ≥ 2× corpus-
    wide, with distinct-doc and occurrence counts (map-side partial agg
    collapses hot boilerplate before the one exchange)."""
    from dedupe_trees_spark.operators.paragraphs import paragraph_dup_stats

    return paragraph_dup_stats(_chunk_paras(spark, sf_dir))


SQL_PARAGRAPH_DUP_STATS = f"""
WITH {_PARAS_SQL}
SELECT para, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM paras GROUP BY para HAVING count(*) >= 2
"""


def q_paragraph_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup, CCNet semantics: keep only the
    global first occurrence (by (doc_id, pos)) of every distinct
    paragraph and rebuild each document in order — one row per input
    doc, empty string when nothing survives. Engine side uses the
    skew-safe groupBy(hash)+join-back keeper (operators/paragraphs.py);
    the oracle states the same rule as a row_number window."""
    from dedupe_trees_spark.operators.paragraphs import paragraph_dedup

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return paragraph_dedup(d, _chunk_paras(spark, sf_dir), sep=" ")


SQL_PARAGRAPH_DEDUP_TEXT = f"""
WITH {_PARAS_SQL},
kept AS (
  SELECT doc_id, pos, para FROM paras
  QUALIFY row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1
)
SELECT d.doc_id,
       coalesce(string_agg(k.para, ' ' ORDER BY k.pos), '') AS clean_text
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.doc_id
"""


def q_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition quality signals — duplicate-
    line fraction, duplicate-line character fraction, top-bigram
    fraction — as a pure shuffle-free codegen map (no explode/UDF)."""
    from dedupe_trees_spark.operators.textstats import repetition_features

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_features(d, chunk=8).select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac", "top_bigram_frac"
    )


SQL_REPETITION_SCORES = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS arr,
         len(string_split(text, ' ')) AS n
  FROM documents
),
feats AS (
  SELECT doc_id, n,
    list_transform(generate_series(0, CAST(ceil(n / 8.0) AS INT) - 1),
                   i -> array_to_string(arr[(i*8+1):(i*8+8)], ' ')) AS lines,
    CASE WHEN n >= 2
         THEN list_transform(generate_series(1, n - 1), i -> arr[i] || ' ' || arr[i+1])
         ELSE [] END AS bg
  FROM toks
)
SELECT doc_id,
  CAST(len(lines) AS INT) AS n_lines,
  round(1.0 - len(list_distinct(lines)) / CAST(len(lines) AS DOUBLE), 8) AS dup_line_frac,
  round(list_sum(list_transform(lines,
          x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1 THEN length(x) ELSE 0 END))
        / CAST(greatest(list_sum(list_transform(lines, x -> length(x))), 1) AS DOUBLE),
        8) AS dup_line_char_frac,
  round(CASE WHEN n < 2 THEN 0.0
             ELSE CAST(list_max(list_transform(bg, b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE)
                  / (n - 1) END, 8) AS top_bigram_frac
FROM feats
"""


def _messy_url(doc_id: Column) -> Column:
    """Deterministic messy-crawl URL for the fixture docs: ~2.5 docs per
    canonical target (doc_id % 200) wearing scheme/host case, default
    ports, trailing slashes, tracking params, and fragments. Mirrored
    1:1 by `_MESSY_URL_SQL` — keep in sync."""
    gid = doc_id % 200
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit("https://")).otherwise(F.lit("HTTPS://")),
        F.when(doc_id % 3 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.lit("site"), (gid % 7).cast("string"), F.lit(".com"),
        F.when(doc_id % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), gid.cast("string"),
        F.when(doc_id % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(doc_id % 4 == 0, F.lit("?utm_source=tw&fbclid=abc"))
        .when(doc_id % 4 == 1, F.lit("?utm_medium=m"))
        .when(doc_id % 4 == 2,
              F.concat(F.lit("?id="), (gid % 4).cast("string"), F.lit("&utm_campaign=c")))
        .otherwise(F.lit("")),
        F.when(doc_id % 6 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


_MESSY_URL_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END)
    || 'site' || CAST((doc_id % 200) % 7 AS VARCHAR) || '.com'
    || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
    || '/p/' || CAST(doc_id % 200 AS VARCHAR)
    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=tw&fbclid=abc'
             WHEN doc_id % 4 = 1 THEN '?utm_medium=m'
             WHEN doc_id % 4 = 2 THEN '?id=' || CAST((doc_id % 200) % 4 AS VARCHAR) || '&utm_campaign=c'
             ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END)
"""

_NORM_URL_SQL = """
s1 AS (SELECT doc_id, url, split_part(url, '#', 1) AS nofrag FROM raw),
s2 AS (SELECT doc_id, url, split_part(nofrag, '?', 1) AS base,
              split_part(nofrag, '?', 2) AS q FROM s1),
s3 AS (
  SELECT doc_id, url, base,
    array_to_string(list_filter(string_split(q, '&'),
      p -> NOT (p LIKE 'utm_%' OR p LIKE 'fbclid=%'
                OR p LIKE 'gclid=%' OR p LIKE 'msclkid=%')), '&') AS qf
  FROM s2
),
s4 AS (
  SELECT doc_id, url, qf,
    replace(lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', 0)),
            '://www.', '://') AS origin0,
    substr(base, length(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', 0)) + 1) AS rest
  FROM s3
),
s5 AS (
  SELECT doc_id, url, qf, rest,
    CASE WHEN origin0 LIKE 'https://%' AND origin0 LIKE '%:443'
           THEN substr(origin0, 1, length(origin0) - 4)
         WHEN origin0 LIKE 'http://%' AND origin0 LIKE '%:80'
           THEN substr(origin0, 1, length(origin0) - 3)
         ELSE origin0 END AS origin
  FROM s4
),
normed AS (
  SELECT doc_id, url,
    origin
    || (CASE WHEN regexp_replace(rest, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(rest, '/+$', '') END)
    || (CASE WHEN qf != '' THEN '?' || qf ELSE '' END) AS norm_url
  FROM s5
)
"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL canonicalization map: fragment/tracking-param strip,
    origin lowercasing, www./default-port removal, trailing-slash
    collapse (functions.text.normalize_url, pure codegen)."""
    from dedupe_trees_spark.functions.text import normalize_url

    d = load(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn("url", _messy_url(F.col("doc_id")))
    return d.select("doc_id", "url", normalize_url("url").alias("norm_url"))


SQL_URL_NORMALIZE = f"""
WITH raw AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
{_NORM_URL_SQL}
SELECT doc_id, url, norm_url FROM normed
"""


def q_url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-level URL dedup: collapse messy variants onto their
    canonical URL; keeper = min doc_id per group (groupBy with map-side
    partial agg — the same shape the re-crawl collapse uses at scale)."""
    from dedupe_trees_spark.functions.text import normalize_url

    d = load(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn("url", _messy_url(F.col("doc_id")))
    return (
        d.select("doc_id", normalize_url("url").alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


SQL_URL_CANONICAL_GROUPS = f"""
WITH raw AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
{_NORM_URL_SQL}
SELECT norm_url, count(*) AS n_docs, min(doc_id) AS keeper_doc_id
FROM normed GROUP BY norm_url
"""


QUERIES.update(
    {
        "paragraph_dup_stats": q_paragraph_dup_stats,
        "paragraph_dedup_text": q_paragraph_dedup_text,
        "repetition_scores": q_repetition_scores,
        "url_normalize": q_url_normalize,
        "url_canonical_groups": q_url_canonical_groups,
    }
)

ORACLES.update(
    {
        "paragraph_dup_stats": SQL_PARAGRAPH_DUP_STATS,
        "paragraph_dedup_text": SQL_PARAGRAPH_DEDUP_TEXT,
        "repetition_scores": SQL_REPETITION_SCORES,
        "url_normalize": SQL_URL_NORMALIZE,
        "url_canonical_groups": SQL_URL_CANONICAL_GROUPS,
    }
)


# --------------------------------------------------------------------------
# Benchmark n-gram decontamination (operators/decontaminate.py, r4)
# --------------------------------------------------------------------------
# Fixture framing: every 23rd document plays the evaluation benchmark;
# the rest are the training corpus. n=5 word-grams (the production rule
# uses n=13; 5 keeps fixture-scale overlap nonzero at both contract SFs
# — measured 5 contaminated docs at sf0.001, 2 at sf0.01).

_DECONTAM_N = 5
_DECONTAM_MOD = 23


def _decontam_split(spark: SparkSession, sf_dir: str):
    d = load(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % _DECONTAM_MOD == 0)
    corpus = d.filter(F.col("doc_id") % _DECONTAM_MOD != 0)
    return corpus, ev


def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus-doc benchmark-overlap report: distinct shared 5-grams,
    distinct eval docs hit, contaminated flag. Eval-side grams broadcast;
    corpus never shuffles (hits-only groupBy + broadcast join-back)."""
    from dedupe_trees_spark.operators.decontaminate import contamination_report

    corpus, ev = _decontam_split(spark, sf_dir)
    return contamination_report(corpus, ev, n=_DECONTAM_N)


SQL_BENCHMARK_CONTAMINATION = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(arr[i:i+{_DECONTAM_N - 1}], ' ') AS g
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - {_DECONTAM_N - 1})) AS i
        FROM toks)
),
ev AS (SELECT DISTINCT g, doc_id AS ev_id FROM grams WHERE doc_id % {_DECONTAM_MOD} = 0),
corp AS (SELECT doc_id, g FROM grams WHERE doc_id % {_DECONTAM_MOD} != 0),
hits AS (
  SELECT c.doc_id, count(DISTINCT c.g) AS n_hit_grams,
         count(DISTINCT e.ev_id) AS n_eval_docs
  FROM corp c JOIN ev e ON c.g = e.g GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.n_hit_grams, 0) AS n_hit_grams,
       coalesce(h.n_eval_docs, 0) AS n_eval_docs,
       coalesce(h.n_hit_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_DECONTAM_MOD} != 0
"""


def q_decontam_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontaminated corpus itself (anti-join on the broadcast
    contaminated-id set) — id + size so the oracle pins row identity."""
    from dedupe_trees_spark.operators.decontaminate import decontaminate

    corpus, ev = _decontam_split(spark, sf_dir)
    return decontaminate(corpus, ev, n=_DECONTAM_N).select("doc_id", "n_chars")


SQL_DECONTAM_SURVIVORS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(arr[i:i+{_DECONTAM_N - 1}], ' ') AS g
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - {_DECONTAM_N - 1})) AS i
        FROM toks)
),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_DECONTAM_MOD} = 0),
dirty AS (
  SELECT DISTINCT c.doc_id FROM grams c JOIN ev e ON c.g = e.g
  WHERE c.doc_id % {_DECONTAM_MOD} != 0
)
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id % {_DECONTAM_MOD} != 0
  AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
"""


QUERIES.update(
    {
        "benchmark_contamination": q_benchmark_contamination,
        "decontam_survivors": q_decontam_survivors,
    }
)

ORACLES.update(
    {
        "benchmark_contamination": SQL_BENCHMARK_CONTAMINATION,
        "decontam_survivors": SQL_DECONTAM_SURVIVORS,
    }
)


# --------------------------------------------------------------------------
# Per-domain corpus shaping (operators/domains.py, r4)
# --------------------------------------------------------------------------
# Domains come from the same deterministic messy-crawl URLs as the URL
# canonicalization queries (7 hosts, case/www/port noise included).

_SQL_DOMAIN = r"""regexp_replace(regexp_replace(regexp_extract(lower(url),
  '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', ''), '^www\.', '')"""

_DOMAIN_CAP = 40


def _docs_with_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dedupe_trees_spark.operators.domains import extract_domain

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    d = d.withColumn("url", _messy_url(F.col("doc_id")))
    return d.withColumn("domain", extract_domain("url"))


def q_domain_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus census (host extraction is pure codegen; one
    map-side-combined groupBy)."""
    return (
        _docs_with_domain(spark, sf_dir)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


SQL_DOMAIN_DOC_STATS = f"""
WITH raw AS (SELECT doc_id, n_chars, {_MESSY_URL_SQL} AS url FROM documents),
dom AS (SELECT doc_id, n_chars, {_SQL_DOMAIN} AS domain FROM raw)
SELECT domain, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS first_doc_id
FROM dom GROUP BY domain
"""


def q_domain_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap: the 40 smallest (url, doc_id) keys
    per domain survive — computed window-free (salted two-phase top-K +
    threshold filter, operators/domains.py::domain_cap) so hot domains
    never serialize into one task."""
    from dedupe_trees_spark.operators.domains import domain_cap

    d = _docs_with_domain(spark, sf_dir)
    return domain_cap(d, _DOMAIN_CAP).select("doc_id", "domain")


SQL_DOMAIN_CAPPED_SAMPLE = f"""
WITH raw AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
dom AS (SELECT doc_id, url, {_SQL_DOMAIN} AS domain FROM raw),
ranked AS (
  SELECT doc_id, domain,
         row_number() OVER (PARTITION BY domain ORDER BY url, doc_id) AS rn
  FROM dom
)
SELECT doc_id, domain FROM ranked WHERE rn <= {_DOMAIN_CAP}
"""


def q_stratified_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting: deterministic md5-threshold sample keeping
    ~60% of en and ~25% of every other language, then a per-lang census
    of the kept set. Pure filter + one groupBy; reproducible across
    engines and repartitionings (no RNG state)."""
    from dedupe_trees_spark.operators.domains import stratified_sample

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    kept = stratified_sample(
        d, fractions={"en": 0.6}, strata_col="lang", default_frac=0.25
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )


SQL_STRATIFIED_SAMPLE_STATS = """
SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM documents
WHERE substr(md5(cast(doc_id AS VARCHAR)), 1, 8)
      < (CASE WHEN lang = 'en' THEN '99999999' ELSE '40000000' END)
GROUP BY lang
"""


QUERIES.update(
    {
        "domain_doc_stats": q_domain_doc_stats,
        "domain_capped_sample": q_domain_capped_sample,
        "stratified_sample_stats": q_stratified_sample_stats,
    }
)

ORACLES.update(
    {
        "domain_doc_stats": SQL_DOMAIN_DOC_STATS,
        "domain_capped_sample": SQL_DOMAIN_CAPPED_SAMPLE,
        "stratified_sample_stats": SQL_STRATIFIED_SAMPLE_STATS,
    }
)


# --------------------------------------------------------------------------
# HTML text extraction (functions/text.py::html_to_text, r4)
# --------------------------------------------------------------------------
# input_hint invariant: "byte-identical extracted text per url". The
# fixture documents carry no html column, so the query wraps each text
# in a deterministic page shell (script + style + comment + body tags —
# exercising every extraction rule) and proves the extraction gives the
# original text back byte-identically, cross-engine.

_HTML_SHELL_PRE = (
    "<html><head><script>var x=1;</script><style>p{color:red}</style>"
    "</head><body><!-- nav -->"
)
_HTML_SHELL_POST = "</body></html>"


def q_html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tag/script/style/comment strip + entity decode, pure codegen
    (zero UDF, zero exchange); roundtrip_ok pins byte-identity."""
    from dedupe_trees_spark.functions.text import html_to_text

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = d.withColumn(
        "html",
        F.concat(F.lit(_HTML_SHELL_PRE), F.col("text"), F.lit(_HTML_SHELL_POST)),
    )
    ex = html_to_text("html")
    return d.select(
        "doc_id",
        (ex == F.col("text")).alias("roundtrip_ok"),
        F.length(ex).alias("n_chars_extracted"),
    )


SQL_HTML_TEXT_EXTRACTION = f"""
WITH wrapped AS (
  SELECT doc_id, text,
    '{_HTML_SHELL_PRE}' || text || '{_HTML_SHELL_POST}' AS html
  FROM documents
),
ex AS (
  SELECT doc_id, text,
    replace(replace(replace(replace(replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        '(?is)<script[^>]*>.*?</script>', '', 'g'),
        '(?is)<style[^>]*>.*?</style>', '', 'g'),
        '(?s)<!--.*?-->', '', 'g'),
        '<[^>]*>', '', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&')
    AS extracted
  FROM wrapped
)
SELECT doc_id, extracted = text AS roundtrip_ok,
       length(extracted) AS n_chars_extracted
FROM ex
"""


QUERIES.update({"html_text_extraction": q_html_text_extraction})
ORACLES.update({"html_text_extraction": SQL_HTML_TEXT_EXTRACTION})


def q_blocklist_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl hygiene: blocklist two of the seven messy-crawl domains and
    one URL pattern; survivors keep id + size. Broadcast anti-join on
    the extracted domain — the corpus is scanned, never shuffled."""
    from dedupe_trees_spark.operators.domains import block_urls

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = d.withColumn("url", _messy_url(F.col("doc_id")))
    kept = block_urls(
        d,
        blocked_domains=["site1.com", "site4.com"],
        url_patterns=[r"\?id=3"],
    )
    return kept.select("doc_id", "n_chars")


SQL_BLOCKLIST_SURVIVORS = f"""
WITH raw AS (SELECT doc_id, n_chars, {_MESSY_URL_SQL} AS url FROM documents),
dom AS (SELECT doc_id, n_chars, url, {_SQL_DOMAIN} AS domain FROM raw)
SELECT doc_id, n_chars FROM dom
WHERE domain NOT IN ('site1.com', 'site4.com')
  AND NOT regexp_matches(url, '\\?id=3')
"""


QUERIES.update({"blocklist_survivors": q_blocklist_survivors})
ORACLES.update({"blocklist_survivors": SQL_BLOCKLIST_SURVIVORS})


def q_pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII hygiene pass: inject deterministic e-mail / IPv4 / phone /
    SSN strings into the fixture text (both engines build the same
    augmented string), scrub with the shared RE2-compatible pattern
    table, and report per-kind counts + an md5 signature of the
    scrubbed text. Map-only: zero exchanges, zero UDFs."""
    from dedupe_trees_spark.operators.pii import pii_counts, scrub_pii

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), (did % 97).cast("string"),
        F.lit("@mail"), (did % 5).cast("string"), F.lit(".example.com"),
        F.lit(" from 10."), (did % 256).cast("string"),
        F.lit(".3."), (did % 100).cast("string"),
        F.lit(" call 555-"), F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"), F.lpad((did % 10000).cast("string"), 4, "0"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" ssn 123-45-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    out = d.withColumn("aug", aug).withColumn("scrubbed", scrub_pii("aug"))
    for name, expr in pii_counts("aug").items():
        out = out.withColumn(name, expr)
    return out.select(
        "doc_id", "n_emails", "n_ips", "n_ssns", "n_phones",
        F.length("scrubbed").alias("n_chars_scrubbed"),
        F.md5(F.col("scrubbed").cast("binary")).alias("scrub_sig"),
    )


def _pii_oracle() -> str:
    from dedupe_trees_spark.operators.pii import pii_oracle_sql

    scrub, counts = pii_oracle_sql("aug")
    count_cols = ", ".join(counts)
    return f"""
WITH aug_t AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id % 97 AS VARCHAR)
         || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
         || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
         || '.3.' || CAST(doc_id % 100 AS VARCHAR)
         || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || (CASE WHEN doc_id % 3 = 0
                  THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END) AS aug
  FROM documents
),
scrubbed_t AS (
  SELECT doc_id, {count_cols}, {scrub} AS scrubbed FROM aug_t
)
SELECT doc_id, n_emails, n_ips, n_ssns, n_phones,
       length(scrubbed) AS n_chars_scrubbed,
       md5(scrubbed) AS scrub_sig
FROM scrubbed_t
"""


SQL_PII_SCRUB_STATS = _pii_oracle()

QUERIES.update({"pii_scrub_stats": q_pii_scrub_stats})
ORACLES.update({"pii_scrub_stats": SQL_PII_SCRUB_STATS})


def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality battery (Rae et al. 2021 A1.1): word-count
    bounds, mean word length, symbol ratio, alpha-word fraction,
    stopword hits, bullet/ellipsis line fractions, one flag per rule
    plus the keep conjunction. The fixture corpus is single-line, so
    both engines append the same deterministic multi-line tail (bullet
    lines, a sometimes-ellipsis-terminated closer, a symbol-heavy line)
    keyed on doc_id — every rule fires both ways on the fixture.
    Map-only: zero exchanges, zero UDFs."""
    from dedupe_trees_spark.operators.textstats import gopher_rules

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.lit("\n- bullet item "), (did % 7).cast("string"),
        F.when(did % 4 == 0, F.lit("\n* starred item")).otherwise(F.lit("")),
        F.lit("\ntail line "), (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit(" trailing...")).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("\n## ## ## ## ##")).otherwise(F.lit("")),
    )
    out = gopher_rules(
        d.withColumn("aug", aug), text_col="aug",
        min_words=20, max_words=200,
    )
    return out.select(
        "doc_id", "n_words", "n_lines",
        F.round("mean_word_len", 8).alias("mean_word_len"),
        F.round("symbol_ratio", 8).alias("symbol_ratio"),
        F.round("alpha_frac", 8).alias("alpha_frac"),
        "stop_hits",
        F.round("bullet_frac", 8).alias("bullet_frac"),
        F.round("ellipsis_frac", 8).alias("ellipsis_frac"),
        "flag_word_count", "flag_mean_word_len", "flag_symbol_ratio",
        "flag_alpha", "flag_stop", "flag_bullet", "flag_ellipsis",
        "gopher_keep",
    )


def _gopher_stop_sql() -> str:
    from dedupe_trees_spark.operators.textstats import GOPHER_STOPWORDS

    return " + ".join(
        f"(CASE WHEN contains(p, ' {w} ') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS
    )


SQL_GOPHER_QUALITY_FLAGS = f"""
WITH aug_t AS (
  SELECT doc_id,
    text || chr(10) || '- bullet item ' || CAST(doc_id % 7 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '* starred item' ELSE '' END)
         || chr(10) || 'tail line ' || CAST(doc_id % 11 AS VARCHAR)
         || (CASE WHEN doc_id % 3 = 0 THEN ' trailing...' ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || '## ## ## ## ##' ELSE '' END)
      AS aug
  FROM documents
), feats AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(aug, '\\s+'), x -> x != '') AS words,
    string_split(aug, chr(10)) AS lines,
    ' ' || replace(lower(aug), chr(10), ' ') || ' ' AS p,
    CAST(length(aug) - length(replace(aug, '#', '')) AS INT)
      + CAST((length(aug) - length(replace(aug, '...', ''))) / 3 AS INT) AS symbols
  FROM aug_t
), m AS (
  SELECT doc_id,
    len(words) AS n_words,
    len(lines) AS n_lines,
    COALESCE(list_sum(list_transform(words, x -> length(x))), 0) AS word_chars,
    len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
    len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* '))) AS bullet_lines,
    len(list_filter(lines, x -> ends_with(x, '...'))) AS ellipsis_lines,
    symbols,
    {_gopher_stop_sql()} AS stop_hits
  FROM feats
), r AS (
  SELECT doc_id, n_words, n_lines, stop_hits,
    CAST(word_chars AS DOUBLE) / greatest(n_words, 1) AS mean_word_len,
    CAST(symbols AS DOUBLE) / greatest(n_words, 1) AS symbol_ratio,
    CAST(alpha_words AS DOUBLE) / greatest(n_words, 1) AS alpha_frac,
    CAST(bullet_lines AS DOUBLE) / greatest(n_lines, 1) AS bullet_frac,
    CAST(ellipsis_lines AS DOUBLE) / greatest(n_lines, 1) AS ellipsis_frac
  FROM m
)
SELECT doc_id, n_words, n_lines,
  round(mean_word_len, 8) AS mean_word_len,
  round(symbol_ratio, 8) AS symbol_ratio,
  round(alpha_frac, 8) AS alpha_frac,
  stop_hits,
  round(bullet_frac, 8) AS bullet_frac,
  round(ellipsis_frac, 8) AS ellipsis_frac,
  (n_words >= 20 AND n_words <= 200) AS flag_word_count,
  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS flag_mean_word_len,
  (symbol_ratio <= 0.1) AS flag_symbol_ratio,
  (alpha_frac >= 0.8) AS flag_alpha,
  (stop_hits >= 2) AS flag_stop,
  (bullet_frac <= 0.9) AS flag_bullet,
  (ellipsis_frac <= 0.3) AS flag_ellipsis,
  (n_words >= 20 AND n_words <= 200
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8 AND stop_hits >= 2
   AND bullet_frac <= 0.9 AND ellipsis_frac <= 0.3) AS gopher_keep
FROM r
"""

QUERIES.update({"gopher_quality_flags": q_gopher_quality_flags})
ORACLES.update({"gopher_quality_flags": SQL_GOPHER_QUALITY_FLAGS})


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): embedding-
    cosine near-dup pairs (SRP-blocked, exact-cosine verified — the
    same fixed-seed config exhaustively verified lossless for
    ``embedding_neardup_pairs``) → connected components → keep the
    min-id member per semantic cluster. Pure composition of shipped
    operators, so the 100-TB shape is inherited: bucket-equi candidate
    join, O(log n) CC rounds, no all-pairs anywhere. Oracle: recursive-
    CTE transitive closure over the brute-force cosine graph."""
    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pairs = neardup_pairs(e, tau=0.35, dim=64, n_bits=4, n_tables=64, seed=42)
    comps = assign_components(
        e.select("vec_id"), pairs, id_col="vec_id", a="id_a", b="id_b"
    )
    w = Window.partitionBy("component_id")
    return comps.select(
        "vec_id",
        F.col("component_id").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("vec_id") == F.col("component_id")).alias("is_kept"),
    )


SQL_SEMANTIC_DEDUP = """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
scored AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         CASE WHEN list_sum(list_transform(a.emb, x -> x * x)) > 0
               AND list_sum(list_transform(b.emb, x -> x * x)) > 0
              THEN list_dot_product(a.emb, b.emb)
                   / (sqrt(list_sum(list_transform(a.emb, x -> x * x)))
                      * sqrt(list_sum(list_transform(b.emb, x -> x * x))))
              ELSE 0.0 END AS cos_raw
  FROM e a, e b WHERE a.vec_id < b.vec_id
),
p AS (SELECT va, vb FROM scored WHERE cos_raw >= 0.35),
edges AS (SELECT va AS u, vb AS v FROM p UNION SELECT vb, va FROM p),
reach(u, v) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT r.u, ed.v FROM reach r JOIN edges ed ON r.v = ed.u
),
comp AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
SELECT vec_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       (vec_id = cluster_id) AS is_kept
FROM comp
"""

QUERIES.update({"semantic_dedup": q_semantic_dedup})
ORACLES.update({"semantic_dedup": SQL_SEMANTIC_DEDUP})


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup decisions: pairs whose exact longest shared run
    covers ≥ 80% of the shorter document → remove the shorter doc (tie:
    keep the smaller id). Built on the suffix-array extent operator;
    lengths ride the existing per-pair text join, zero added exchanges.
    Oracle: the extent query's diagonal-chain CTEs + the same length
    arithmetic."""
    from dedupe_trees_spark.operators.substring import containment_decisions

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = containment_decisions(
        d, id_col="doc_id", frac=0.8, min_run=64, k=24, cap=4096
    )
    return out.select(
        "doc_kept", "doc_removed", "max_run",
        F.round("contain_frac", 8).alias("contain_frac"),
    )


_EXTENT_WITH = SQL_SUBSTRING_EXTENT_PAIRS[
    : SQL_SUBSTRING_EXTENT_PAIRS.rindex("SELECT")
]
SQL_CONTAINMENT_DEDUP = f"""{_EXTENT_WITH},
ext AS (
  SELECT doc_a, doc_b, CAST(max(run_len) AS BIGINT) AS max_run
  FROM chains GROUP BY doc_a, doc_b
),
l AS (SELECT doc_id, length(text) AS n FROM documents),
j AS (
  SELECT e.doc_a, e.doc_b, e.max_run, la.n AS na, lb.n AS nb,
         CAST(e.max_run AS DOUBLE) / least(la.n, lb.n) AS cf
  FROM ext e JOIN l la ON la.doc_id = e.doc_a JOIN l lb ON lb.doc_id = e.doc_b
)
SELECT CASE WHEN na > nb OR (na = nb AND doc_a < doc_b) THEN doc_a ELSE doc_b END
         AS doc_kept,
       CASE WHEN na > nb OR (na = nb AND doc_a < doc_b) THEN doc_b ELSE doc_a END
         AS doc_removed,
       max_run,
       round(cf, 8) AS contain_frac
FROM j WHERE cf >= 0.8
"""

QUERIES.update({"containment_dedup": q_containment_dedup})
ORACLES.update({"containment_dedup": SQL_CONTAINMENT_DEDUP})


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate mining: top-20 3-word grams by document frequency
    (per-doc-distinct, min_df=2), ties broken by gram string so the
    cut is deterministic in both engines."""
    from dedupe_trees_spark.operators.decontaminate import top_ngrams

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return top_ngrams(d, n=3, k=20, min_df=2)


SQL_TOP_NGRAMS = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
g AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS gram
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i
        FROM toks WHERE len(arr) >= 3)
),
c AS (SELECT gram, count(*) AS doc_freq FROM g GROUP BY gram)
SELECT gram, doc_freq FROM c
WHERE doc_freq >= 2
ORDER BY doc_freq DESC, gram ASC
LIMIT 20
"""

QUERIES.update({"top_ngrams": q_top_ngrams})
ORACLES.update({"top_ngrams": SQL_TOP_NGRAMS})


def q_outlink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + link-graph stats: both engines wrap the
    fixture text in the same deterministic HTML with 1-3 anchors keyed
    on doc_id, extract href targets with the shared regex, and count
    per-target-domain links + distinct linking docs."""
    from dedupe_trees_spark.operators.domains import outlink_stats

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><body><p>'), F.col("text"), F.lit('</p>'),
        F.lit('<a href="https://site'), (did % 7).cast("string"),
        F.lit('.com/page'), (did % 11).cast("string"), F.lit('">l1</a>'),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<a href="http://www.site'), (did % 5).cast("string"),
                F.lit('.com:8080/x">l2</a>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit('<a href="https://ext'), (did % 13).cast("string"),
                F.lit('.org/y?q=1">l3</a>'),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return outlink_stats(
        d.withColumn("html", html), html_col="html", id_col="doc_id"
    )


SQL_OUTLINK_STATS = """
WITH h AS (
  SELECT doc_id,
    '<html><body><p>' || text || '</p>'
    || '<a href="https://site' || CAST(doc_id % 7 AS VARCHAR)
    || '.com/page' || CAST(doc_id % 11 AS VARCHAR) || '">l1</a>'
    || (CASE WHEN doc_id % 3 = 0
             THEN '<a href="http://www.site' || CAST(doc_id % 5 AS VARCHAR)
                  || '.com:8080/x">l2</a>' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0
             THEN '<a href="https://ext' || CAST(doc_id % 13 AS VARCHAR)
                  || '.org/y?q=1">l3</a>' ELSE '' END)
    || '</body></html>' AS html
  FROM documents
),
links AS (
  SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS link
  FROM h
),
dom AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_extract(lower(link),
      '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1), ':[0-9]+$', ''), '^www\\.', '')
      AS domain
  FROM links
)
SELECT domain, count(*) AS n_links, count(DISTINCT doc_id) AS n_docs
FROM dom WHERE domain != ''
GROUP BY domain
"""

QUERIES.update({"outlink_stats": q_outlink_stats})
ORACLES.update({"outlink_stats": SQL_OUTLINK_STATS})


def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: n-gram-set CONTAINMENT |A∩B| / min(|A|,|B|)
    ≥ 0.9 — catches a short doc quoted inside a long one, which
    symmetric Jaccard structurally misses (J ≤ |A|/|B| for A ⊆ B).
    Same skew-guarded inverted-index plan as ngram_jaccard_pairs
    (DF-capped shingle space, groupBy+join-back sizes); only the final
    score arithmetic differs. Complements containment_dedup (exact
    VERBATIM runs) with a bag-of-shingles notion that tolerates small
    edits inside the quoted span."""
    return (
        _capped_gram_pair_scores(spark, sf_dir)
        .withColumn(
            "containment",
            F.col("c").cast("double") / F.least("na", "nb"),
        )
        .filter(F.col("containment") >= 0.9)
        .select("doc_a", "doc_b", F.round("containment", 8).alias("containment"))
    )


SQL_NGRAM_CONTAINMENT_PAIRS = f"""
WITH {_JACCARD_CAPPED_CTES},
cpairs AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.c AS DOUBLE) / least(sa.n, sb.n) AS containment
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, round(containment, 8) AS containment
FROM cpairs WHERE containment >= 0.9
"""

QUERIES.update({"ngram_containment_pairs": q_ngram_containment_pairs})
ORACLES.update({"ngram_containment_pairs": SQL_NGRAM_CONTAINMENT_PAIRS})


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set data-card stats: per-language doc counts, total
    chars, and EXACT length/token quantiles (p50/p90/p99, linear
    interpolation — Spark `percentile` and DuckDB `quantile_cont`
    compute the same estimator, so this is equality-oracled, unlike
    sketch-based approx quantiles). One partial-agg exchange on lang;
    at 10^12 docs swap `percentile` for `percentile_approx` and the
    oracle for a tolerance check — documented trade, exact here."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.size(F.split("text", " ")).alias("ws_tokens"),
    )
    qs = F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    out = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.percentile("n_chars", qs).alias("_cq"),
        F.percentile("ws_tokens", qs).alias("_tq"),
    )
    return out.select(
        "lang", "n_docs", "total_chars",
        F.round(F.col("_cq")[0], 6).alias("chars_p50"),
        F.round(F.col("_cq")[1], 6).alias("chars_p90"),
        F.round(F.col("_cq")[2], 6).alias("chars_p99"),
        F.round(F.col("_tq")[0], 6).alias("tokens_p50"),
        F.round(F.col("_tq")[1], 6).alias("tokens_p90"),
        F.round(F.col("_tq")[2], 6).alias("tokens_p99"),
    )


SQL_CORPUS_STATS = """
WITH d AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS ws_tokens
  FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.5), 6) AS chars_p50,
       round(quantile_cont(n_chars, 0.9), 6) AS chars_p90,
       round(quantile_cont(n_chars, 0.99), 6) AS chars_p99,
       round(quantile_cont(ws_tokens, 0.5), 6) AS tokens_p50,
       round(quantile_cont(ws_tokens, 0.9), 6) AS tokens_p90,
       round(quantile_cont(ws_tokens, 0.99), 6) AS tokens_p99
FROM d GROUP BY lang
"""

QUERIES.update({"corpus_stats": q_corpus_stats})
ORACLES.update({"corpus_stats": SQL_CORPUS_STATS})


def q_jaccard_calibration_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-calibration histogram for near-dup config: the exact
    shingle-Jaccard distribution over every candidate pair (any shared
    DF-capped shingle), binned at 0.05. This is the diagnostic that
    picks tau and the MinHash bands×rows operating point — the S-curve
    P[candidate] = 1-(1-j^r)^b must put its knee where the corpus's
    pair mass thins out, and this histogram is where that mass sits.
    Same skew-guarded relational core as ngram_jaccard_pairs
    (`_capped_gram_pair_scores`); at the 10^12-doc design point run it
    over a deterministic-hash document sample (deterministic_sample) —
    the histogram is an estimator, a 10^-4 sample of pairs suffices.

    Bin arithmetic (floor(j*20)/20) is identical IEEE-double work on
    both sides, so the oracle check is value-hash equality."""
    scored = _capped_gram_pair_scores(spark, sf_dir).withColumn(
        "jaccard",
        F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c")),
    )
    return (
        scored.withColumn(
            "j_bin", F.floor(F.col("jaccard") * 20).cast("double") / 20
        )
        .groupBy("j_bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


SQL_JACCARD_CALIBRATION_HIST = f"""
WITH {_JACCARD_CAPPED_CTES},
jall AS (
  SELECT CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT CAST(floor(jaccard * 20) AS DOUBLE) / 20 AS j_bin, count(*) AS n_pairs
FROM jall GROUP BY 1
"""

QUERIES.update({"jaccard_calibration_hist": q_jaccard_calibration_hist})
ORACLES.update({"jaccard_calibration_hist": SQL_JACCARD_CALIBRATION_HIST})


def q_unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained unigram-LM quality scores (CCNet-style
    perplexity-filter stand-in; operator docstring:
    operators/textstats.py::unigram_logprob — broadcast vocab bounded
    by Zipf at total/min_count, rare tokens pooled into UNK so no
    corpus-sized shuffle exists on the token key). The derived view
    appends a per-doc singleton token to every 50th document so the
    UNK path is exercised — and oracle-checked — at fixture scale."""
    from dedupe_trees_spark.operators.textstats import unigram_logprob

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(" zq"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return unigram_logprob(d, min_count=5)


SQL_UNIGRAM_LOGPROB_SCORES = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN text || ' zq' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM base),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
tot AS (
  SELECT CAST(sum(c) AS DOUBLE) AS total,
         CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS DOUBLE) AS unk_mass
  FROM counts
),
vocab AS (SELECT tok, c FROM counts WHERE c >= 5),
scored AS (
  SELECT t.doc_id,
         ln(CAST(coalesce(v.c, CAST(tot.unk_mass AS BIGINT)) AS DOUBLE) / tot.total) AS lp
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_tokens, round(avg(lp), 6) AS logprob
FROM scored GROUP BY doc_id
"""

QUERIES.update({"unigram_logprob_scores": q_unigram_logprob_scores})
ORACLES.update({"unigram_logprob_scores": SQL_UNIGRAM_LOGPROB_SCORES})


def q_crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-over-crawl diff (operators/crawl.py::snapshot_diff): two
    snapshots derived deterministically from the documents fixture —
    crawl A misses every (id%10==3) url, crawl B misses (id%10==7) and
    re-crawled every (id%5==0) page to changed content — classified
    added/vanished/changed/unchanged by one full-outer join on the url
    key with map-side xxhash64 content fingerprints. The oracle states
    the same classes by direct text comparison, so the check also pins
    hash-identity ⇔ text-identity on this input."""
    from dedupe_trees_spark.operators.crawl import snapshot_diff

    d = load(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 != 3).select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new, key_col="doc_id", content_col="text")


SQL_CRAWL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3
),
new_ AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 != 7
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'vanished'
            WHEN o.text = n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new_ n ON o.doc_id = n.doc_id
"""

QUERIES.update({"crawl_snapshot_diff": q_crawl_snapshot_diff})
ORACLES.update({"crawl_snapshot_diff": SQL_CRAWL_SNAPSHOT_DIFF})


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF keywords (operator docstring:
    operators/textstats.py::tfidf_keywords — skew-split token join:
    broadcast-hot / shuffle-cold legs of the same logical join). The
    derived view appends a per-doc singleton token to every 50th doc,
    and hot_df=100 puts the fixture vocabulary in the broadcast leg and
    those singletons in the shuffle leg, so BOTH physical paths are
    oracle-checked. The oracle states the single logical join — the
    split must be invisible in the values."""
    from dedupe_trees_spark.operators.textstats import tfidf_keywords

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(F.col("text"), F.lit(" zq"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = tfidf_keywords(d, k=3, hot_df=100)
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_TFIDF_KEYWORDS = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN text || ' zq' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM base),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         round(t.tf * ln(nd.n_docs / d.df_t), 6) AS score
  FROM tf t JOIN dfq d USING (term) CROSS JOIN nd
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, score FROM ranked WHERE rank <= 3
"""

QUERIES.update({"tfidf_keywords": q_tfidf_keywords})
ORACLES.update({"tfidf_keywords": SQL_TFIDF_KEYWORDS})


def q_quality_canonical_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted canonical selection — the LLM-pipeline variant
    of the reference's resolver chain (R4/R8/R10 semantics, new key):
    per duplicate set keep the HIGHEST-quality member (composite score
    from operators/textstats.py::quality_score), ties broken by the
    arbitrary terminal. Production web-text dedup keeps the best page
    per cluster, not the min-id one; this shows the resolver framework
    carries that policy with one extra named key (`quality_best`),
    same single window shuffle on component_id."""
    from dedupe_trees_spark.operators.textstats import quality_score

    pages = documents_as_pages(spark, sf_dir).withColumn(
        "component_id", F.col("lang")
    )
    scored = quality_score(pages)
    resolved = R.resolve(scored, ["quality_best", "arbitrary"])
    return resolved.filter("is_canonical").select(
        "component_id", "url", F.round("quality", 8).alias("quality")
    )


SQL_QUALITY_CANONICAL_PICK = f"""
WITH pages AS ({_PAGES_SQL}),
feats AS (
  SELECT url, lang AS component_id,
         len(string_split(text, ' ')) AS n_tokens,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
         length(regexp_replace(text, '[0-9A-Za-z\\s]', '', 'g')) AS punct,
         length(text) AS n_chars
  FROM pages
), scored AS (
  SELECT url, component_id,
         (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END
          + (1.0 - least(CAST(digits AS DOUBLE) / greatest(n_chars, 1) * 4, 1.0))
          + (1.0 - least(CAST(punct AS DOUBLE) / greatest(n_chars, 1) * 4, 1.0))) / 3.0 AS quality
  FROM feats
), ranked AS (
  SELECT component_id, url, quality,
         row_number() OVER (PARTITION BY component_id
                            ORDER BY quality DESC, url ASC) AS rn
  FROM scored
)
SELECT component_id, url, round(quality, 8) AS quality
FROM ranked WHERE rn = 1
"""

QUERIES.update({"quality_canonical_pick": q_quality_canonical_pick})
ORACLES.update({"quality_canonical_pick": SQL_QUALITY_CANONICAL_PICK})


def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: global exclusive prefix sum of token
    counts in doc_id order, shard = cum_before div target. The engine
    computes it with the two-phase distributed scan (range partition →
    per-partition sums → driver prefix over P rows → mapInPandas
    cumsum) — NO single-partition window anywhere in the plan; the
    DuckDB oracle and the pack_shards_window pytest twin both use the
    textbook global window, so equality adjudicates the distributed
    formulation exactly."""
    from dedupe_trees_spark.operators.shards import pack_shards

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_shards(d, target_tokens=5000, id_col="doc_id")


SQL_PACK_SHARDS = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, n_tokens, cum_before,
       CAST(cum_before // 5000 AS BIGINT) AS shard_id FROM c
"""

QUERIES.update({"pack_shards": q_pack_shards})
ORACLES.update({"pack_shards": SQL_PACK_SHARDS})


def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (counts^alpha) language rebalancing at alpha=0.5:
    the smallest language is kept whole, larger ones are downsampled
    by sqrt(c_min/c_l) with the md5-prefix predicate. Every float op
    is IEEE-correctly-rounded (one int division, one sqrt), so the
    kept row set matches the DuckDB oracle exactly."""
    from dedupe_trees_spark.operators.domains import temperature_resample

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_resample(d, strata_col="lang", alpha=0.5, key_col="doc_id")


SQL_TEMPERATURE_RESAMPLE = """
WITH c AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY lang
), m AS (SELECT min(cnt) AS cmin FROM c),
f AS (
  SELECT lang, sqrt((SELECT cmin FROM m) / cnt) AS keep_f FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN f USING (lang)
WHERE f.keep_f >= 1.0
   OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      < printf('%08x', CAST(floor(f.keep_f * 4294967296.0) AS BIGINT))
"""

QUERIES.update({"temperature_resample": q_temperature_resample})
ORACLES.update({"temperature_resample": SQL_TEMPERATURE_RESAMPLE})


def q_hashed_term_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorizer (hashingTF shape): per-doc sparse
    term counts in a 512-bucket space via md5-prefix buckets —
    portable across engines, so the oracle asserts exact (id, bucket,
    cnt) equality. One map-side-combined exchange on the uniform
    (doc, bucket) key."""
    from dedupe_trees_spark.operators.textstats import hashing_features

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return hashing_features(d, dim=512, id_col="doc_id")


SQL_HASHED_TERM_FEATURES = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(token), 1, 8))::UBIGINT % 512 AS INT) AS bucket,
       count(*) AS cnt
FROM tok
WHERE token != ''
GROUP BY doc_id, bucket
"""

QUERIES.update({"hashed_term_features": q_hashed_term_features})
ORACLES.update({"hashed_term_features": SQL_HASHED_TERM_FEATURES})


def q_span_scrubbed_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring SPAN removal (span-level
    training-data dedup — the surgical variant of the substring family:
    cut every verbatim run ≥ 64 chars shared with a smaller-id partner
    out of the larger-id doc, keeping the partner intact; a doc victim
    to several partners removes the UNION of their spans; all pairs
    read ORIGINAL texts so the result is order-independent).

    Engine: the extent operator's winnow candidates → per-pair
    generalized-suffix-array per-suffix cross-doc max-LCP (restarted
    cummin over adjacent LCPs — operators/substring.py::_victim_cover)
    → interval union per victim → splice. Oracle: stride-1 64-gram
    position join → per-partner diagonal chains → gaps-and-islands
    interval merge → ordered string_agg splice. Both sides compute the
    identical union of shared-run occurrences (a run occurrence at
    [s, s+len) implies a per-position cover interval and vice versa),
    so clean_text matches value-exactly."""
    from dedupe_trees_spark.operators.substring import span_scrub

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = span_scrub(d, id_col="doc_id", min_run=64, k=24, cap=4096)
    return out.select("doc_id", "clean_text", "removed_chars", "n_spans")


SQL_SPAN_SCRUBBED_DOCS = """
WITH g AS (
  SELECT doc_id, i, substr(text, i, 64) AS gram
  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 63)) AS i
        FROM documents WHERE length(text) >= 64)
),
m AS (
  SELECT a.doc_id AS keeper, b.doc_id AS victim, a.i AS ia, b.i AS ib
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
),
runs AS (
  SELECT keeper, victim, ib, ia - ib AS diag,
         ib - row_number() OVER (PARTITION BY keeper, victim, ia - ib
                                 ORDER BY ib) AS grp
  FROM m
),
chains AS (
  SELECT victim, min(ib) AS s, min(ib) + count(*) + 63 AS e
  FROM runs GROUP BY keeper, victim, diag, grp
),
ord AS (
  SELECT victim, s, e,
         max(e) OVER (PARTITION BY victim ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM chains
),
grp2 AS (
  SELECT victim, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY victim ORDER BY s, e) AS gid
  FROM ord
),
merged AS (
  SELECT victim AS doc_id, gid, min(s) AS s, max(e) AS e
  FROM grp2 GROUP BY victim, gid
),
bounds AS (
  SELECT doc_id, s, e,
         lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) AS ks
  FROM merged
),
segs AS (
  SELECT doc_id, ks, s AS ke FROM bounds
  UNION ALL
  SELECT doc_id, max(e) AS ks, NULL AS ke FROM merged GROUP BY doc_id
),
spliced AS (
  SELECT seg.doc_id,
         string_agg(substr(d.text, CAST(seg.ks AS INT),
                           CAST(COALESCE(seg.ke, length(d.text) + 1) - seg.ks AS INT)),
                    '' ORDER BY seg.ks) AS clean_text
  FROM segs seg JOIN documents d ON seg.doc_id = d.doc_id
  GROUP BY seg.doc_id
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e - s) AS BIGINT) AS removed_chars
  FROM merged GROUP BY doc_id
)
SELECT p.doc_id, COALESCE(p.clean_text, '') AS clean_text,
       st.removed_chars, st.n_spans
FROM spliced p JOIN stats st USING (doc_id)
"""

QUERIES.update({"span_scrubbed_docs": q_span_scrubbed_docs})
ORACLES.update({"span_scrubbed_docs": SQL_SPAN_SCRUBBED_DOCS})


# --------------------------------------------------------------------------
# Fuzzy (MinHash-LSH) decontamination (operators/decontaminate.py, r4)
# --------------------------------------------------------------------------
# The near-dup complement of the exact n-gram rule: a corpus doc whose
# shingle-Jaccard vs ANY eval doc >= tau is contaminated even when no
# verbatim 13-gram survives the paraphrase. Same mod-23 eval split as
# the exact family; k=3 word shingles (the minhash family's config) so
# the oracle reuses the brute-force cross-Jaccard formulation the
# minhash_lsh_dup_pairs oracle already proves LSH-recall-complete at
# fixture SFs (measured cross-split max J here >= 0.95, far above the
# 32x4 band curve's knee). Engine-side sets are 64-bit hashed shingles;
# set sizes equal distinct-string counts w.h.p., so Jaccard values are
# IEEE-identical cross-engine (same int division).

_FUZZY_TAU = 0.8


def q_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per corpus-doc near-dup benchmark overlap: distinct eval docs with
    J >= tau, max Jaccard, contaminated flag. Eval bands + sets broadcast;
    corpus never shuffled (candidate-proportional exchanges only)."""
    from dedupe_trees_spark.operators.decontaminate import fuzzy_contamination_report

    corpus, ev = _decontam_split(spark, sf_dir)
    return fuzzy_contamination_report(corpus, ev, tau=_FUZZY_TAU)


_FUZZY_CTES = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
grams0 AS (
  SELECT DISTINCT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 2)) AS i FROM toks)
  UNION
  SELECT doc_id, array_to_string(arr, ' ') AS g FROM toks WHERE len(arr) < 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM grams0 GROUP BY doc_id),
corp AS (SELECT * FROM grams0 WHERE doc_id % {_DECONTAM_MOD} != 0),
ev AS (SELECT * FROM grams0 WHERE doc_id % {_DECONTAM_MOD} = 0),
inter AS (
  SELECT c.doc_id AS doc_id, e.doc_id AS ev_id, count(*) AS c
  FROM corp c JOIN ev e ON c.g = e.g GROUP BY 1, 2
),
jp AS (
  SELECT i.doc_id, i.ev_id, CAST(i.c AS DOUBLE)/(sc.n + se.n - i.c) AS j
  FROM inter i JOIN sizes sc ON sc.doc_id = i.doc_id
              JOIN sizes se ON se.doc_id = i.ev_id
  WHERE CAST(i.c AS DOUBLE)/(sc.n + se.n - i.c) >= {_FUZZY_TAU}
)
"""

SQL_FUZZY_CONTAMINATION = f"""
WITH {_FUZZY_CTES},
hits AS (
  SELECT doc_id, count(DISTINCT ev_id) AS n_eval_docs, max(j) AS max_jaccard
  FROM jp GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.n_eval_docs, 0) AS n_eval_docs,
       coalesce(h.max_jaccard, 0.0) AS max_jaccard,
       coalesce(h.n_eval_docs, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {_DECONTAM_MOD} != 0
"""


def q_fuzzy_decontam_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-decontaminated corpus (broadcast anti-join on the
    near-dup-contaminated id set) — id + size pins row identity."""
    from dedupe_trees_spark.operators.decontaminate import fuzzy_decontaminate

    corpus, ev = _decontam_split(spark, sf_dir)
    return fuzzy_decontaminate(corpus, ev, tau=_FUZZY_TAU).select(
        "doc_id", "n_chars"
    )


SQL_FUZZY_DECONTAM_SURVIVORS = f"""
WITH {_FUZZY_CTES}
SELECT d.doc_id, d.n_chars FROM documents d
WHERE d.doc_id % {_DECONTAM_MOD} != 0
  AND d.doc_id NOT IN (SELECT DISTINCT doc_id FROM jp)
"""


QUERIES.update(
    {
        "fuzzy_contamination": q_fuzzy_contamination,
        "fuzzy_decontam_survivors": q_fuzzy_decontam_survivors,
    }
)
ORACLES.update(
    {
        "fuzzy_contamination": SQL_FUZZY_CONTAMINATION,
        "fuzzy_decontam_survivors": SQL_FUZZY_DECONTAM_SURVIVORS,
    }
)


# --------------------------------------------------------------------------
# WARC ingest roundtrip (sources/warc.py, r4)
# --------------------------------------------------------------------------
# Gives the Common-Crawl ingest edge an EQUALITY oracle the driver
# replays every round (it previously had pytest coverage only): the
# documents fixture is serialized as gzipped WARC response records
# (HTTP-wrapped html shell around each text), read back through
# read_pages_warc, and compared column-for-column against values the
# oracle computes straight from the parquet. A hash match proves the
# record walk, Content-Length framing, HTTP-header strip, WARC-Date
# parse, and html→text extraction reproduce (url, warc_ts, text)
# byte-identically — the input_hint invariant at the ingest edge.
# Fixture construction (driver-side write of a few .warc.gz files) is
# test scaffolding; the measured operator is the distributed read.

_WARC_TS0 = "2026-01-01 00:00:00"


def _warc_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build the .warc.gz fixture DISTRIBUTED (write_pages_warc — the
    export sink under test on the way out, the reader on the way back,
    zero driver collect), once per (sf, row count)."""
    import os

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    # cache key = order-insensitive CONTENT hash of the fixture inputs
    # (bit_xor of xxhash64(doc_id, text, source)), not just sf+rowcount:
    # a regenerated documents table with the same row count must never
    # silently reuse a stale export (it would fail/pass the roundtrip
    # for reasons unrelated to the code under test).
    sig = d.agg(
        F.bit_xor(F.xxhash64("doc_id", "text", "source")).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    root = (
        f"/tmp/spark_graft_warc/{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{sig['n']}_{(sig['h'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"
    )
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    from dedupe_trees_spark.sources.warc import write_pages_warc

    pages = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/d"),
            F.col("doc_id").cast("string"), F.lit(".html"),
        ).alias("url"),
        F.expr(
            f"timestamp'{_WARC_TS0}' + make_dt_interval(0, 0, 0, doc_id % 86400)"
        ).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(_HTML_SHELL_PRE), F.col("text"), F.lit(_HTML_SHELL_POST)),
            "UTF-8",
        ).alias("html"),
    )
    write_pages_warc(pages, root, files=8).collect()
    open(marker, "w").close()
    return root


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → .warc.gz → read_pages_warc → per-doc parse proof:
    (doc_id from url, url, warc_ts string, extracted-text md5 + length).
    Oracle computes the same directly from the parquet — equality pins
    the whole ingest path."""
    from dedupe_trees_spark.sources.warc import read_pages_warc

    root = _warc_fixture(spark, sf_dir)
    pages = read_pages_warc(spark, f"{root}/*.warc.gz")
    return pages.select(
        F.regexp_extract("url", r"/d(\d+)\.html$", 1).cast("long").alias("doc_id"),
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.md5("text").alias("text_md5"),
        F.length("text").alias("n_chars_extracted"),
    )


SQL_WARC_ROUNDTRIP = f"""
SELECT doc_id,
       'https://' || source || '.example/d' || CAST(doc_id AS VARCHAR)
         || '.html' AS url,
       strftime(TIMESTAMP '{_WARC_TS0}'
                + (doc_id % 86400) * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS ts,
       md5(text) AS text_md5,
       length(text) AS n_chars_extracted
FROM documents
"""


QUERIES.update({"warc_roundtrip": q_warc_roundtrip})
ORACLES.update({"warc_roundtrip": SQL_WARC_ROUNDTRIP})


# --------------------------------------------------------------------------
# Quality-classifier inference (operators/textstats.py, r4)
# --------------------------------------------------------------------------
# The scoring half of the fastText/DCLM quality-filter loop over the
# hashed-feature space (hashed_term_features is the featurize half).
# The contract "model" is a deterministic weight per bucket —
# (bucket % 997)/997 − 0.5 — expressible identically in both engines,
# so the oracle pins the md5 bucketing, the broadcast left join with
# 0-weight fallback, the tf normalization, and the sigmoid, end to end.
# round(…, 6) on score/prob per the float-sum-order house convention.

_CLS_DIM = 1 << 18


def _cls_weights(feats):  # deterministic model table from the bucket space
    return (
        feats.select("bucket")
        .distinct()
        .withColumn(
            "weight",
            (F.col("bucket") % 997).cast("double") / 997.0 - 0.5,
        )
    )


def q_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc linear-classifier score + sigmoid prob over md5-hashed
    term features, deterministic weights, broadcast model."""
    from dedupe_trees_spark.operators.textstats import (
        hashing_features,
        linear_classifier_score,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    feats = hashing_features(d, dim=_CLS_DIM)
    return linear_classifier_score(feats, _cls_weights(feats), round_to=6)


_CLS_CTES = f"""
toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % {_CLS_DIM} AS INT) AS bucket,
         count(*) AS cnt
  FROM toks GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_terms,
         sum(cnt * ((bucket % 997) / 997.0 - 0.5)) / sum(cnt) AS score
  FROM feats GROUP BY doc_id
)
"""

SQL_CLASSIFIER_SCORES = f"""
WITH {_CLS_CTES}
SELECT doc_id, n_terms, round(score, 6) AS score,
       round(1.0 / (1.0 + exp(-score)), 6) AS prob
FROM scored
"""


def q_classifier_kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter composition: keep docs with prob >= 0.5 (score >= 0),
    id + size pins row identity."""
    from dedupe_trees_spark.operators.textstats import (
        hashing_features,
        quality_classifier_filter,
    )

    d = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    feats = hashing_features(d, dim=_CLS_DIM)
    return quality_classifier_filter(
        d, _cls_weights(feats), threshold=0.5, dim=_CLS_DIM
    ).select("doc_id", "n_chars")


SQL_CLASSIFIER_KEPT_DOCS = f"""
WITH {_CLS_CTES}
SELECT d.doc_id, d.n_chars
FROM documents d JOIN scored s ON d.doc_id = s.doc_id
WHERE round(1.0 / (1.0 + exp(-s.score)), 6) >= 0.5
"""


QUERIES.update(
    {
        "classifier_scores": q_classifier_scores,
        "classifier_kept_docs": q_classifier_kept_docs,
    }
)
ORACLES.update(
    {
        "classifier_scores": SQL_CLASSIFIER_SCORES,
        "classifier_kept_docs": SQL_CLASSIFIER_KEPT_DOCS,
    }
)


# --------------------------------------------------------------------------
# BPE-faithful token counts (functions/bpe.py, r5)
# --------------------------------------------------------------------------
# Shard budgets and temperature weights should count subword tokens,
# not whitespace words (round-4 verdict gap #5). The Spark side is the
# Arrow-batched merge-loop UDF with a per-batch word cache; the oracle
# runs the SAME merge table (shared MERGES constant, PII-style) as a
# recursive CTE whose every level applies the minimum-rank applicable
# merge with a left-to-right list_reduce fold. Equality here pins the
# pre-tokenizer regex, the merge semantics, and the whitespace-run rule
# across engines, end to end.


def _bpe_oracle_prefix() -> str:
    from dedupe_trees_spark.functions.bpe import bpe_count_sql_ctes

    return f"""
WITH RECURSIVE {bpe_count_sql_ctes()},
per AS (
  SELECT p.doc_id,
         CASE WHEN regexp_matches(p.tok, '^[ \t\n\r]+$') THEN 1
              ELSE w.bpe_n END AS c
  FROM pretok p LEFT JOIN wcount w ON p.tok = w.w
),
bpe AS (
  SELECT d.doc_id, CAST(COALESCE(s.n, 0) AS BIGINT) AS bpe_tokens
  FROM documents d
  LEFT JOIN (SELECT doc_id, sum(c) AS n FROM per GROUP BY doc_id) s
    ON d.doc_id = s.doc_id
)
"""


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE subword token count next to the whitespace count —
    the budget drift a whitespace-based packer carries is the delta."""
    from dedupe_trees_spark.functions.bpe import bpe_token_count

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        bpe_token_count("text").alias("bpe_tokens"),
        F.size(
            F.expr(r"filter(split(text, ' '), x -> x != '')")
        ).cast("long").alias("ws_tokens"),
    )


def _sql_bpe_token_counts() -> str:
    return (
        _bpe_oracle_prefix()
        + """
SELECT b.doc_id, b.bpe_tokens,
       CAST(len(list_filter(string_split(d.text, ' '), x -> x != ''))
            AS BIGINT) AS ws_tokens
FROM bpe b JOIN documents d ON b.doc_id = d.doc_id
"""
    )


def q_pack_shards_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_shards over BPE counts: the two-phase distributed prefix
    sum unchanged, budgets now tokenizer-faithful (token_col seam)."""
    from dedupe_trees_spark.functions.bpe import bpe_token_count
    from dedupe_trees_spark.operators.shards import pack_shards

    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", bpe_token_count("text").alias("bpe_tokens"))
    )
    return pack_shards(
        d, target_tokens=5000, id_col="doc_id", token_col="bpe_tokens"
    )


def _sql_pack_shards_bpe() -> str:
    return (
        _bpe_oracle_prefix()
        + """
, c AS (
  SELECT doc_id, bpe_tokens AS n_tokens,
         CAST(sum(bpe_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bpe_tokens
           AS BIGINT) AS cum_before
  FROM bpe
)
SELECT doc_id, n_tokens, cum_before,
       CAST(cum_before // 5000 AS BIGINT) AS shard_id FROM c
"""
    )


QUERIES.update(
    {
        "bpe_token_counts": q_bpe_token_counts,
        "pack_shards_bpe": q_pack_shards_bpe,
    }
)
ORACLES.update(
    {
        "bpe_token_counts": _sql_bpe_token_counts(),
        "pack_shards_bpe": _sql_pack_shards_bpe(),
    }
)


def q_temperature_resample_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted temperature rebalancing: stratum mass = summed
    BPE token budget (weight_col seam) instead of doc count — what a
    training mixture actually balances. Same exact-int ratio + md5
    predicate; kept-row set equality pins the weighted path."""
    from dedupe_trees_spark.functions.bpe import bpe_token_count
    from dedupe_trees_spark.operators.domains import temperature_resample

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", bpe_token_count("text").alias("bpe_tokens")
    )
    return temperature_resample(d, weight_col="bpe_tokens").select(
        "doc_id", "lang"
    )


def _sql_temperature_resample_bpe() -> str:
    return (
        _bpe_oracle_prefix()
        + """
, c AS (
  SELECT d.lang, CAST(sum(b.bpe_tokens) AS DOUBLE) AS cnt
  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id GROUP BY d.lang
), mn AS (SELECT min(cnt) AS cmin FROM c),
f AS (
  SELECT lang, sqrt((SELECT cmin FROM mn) / cnt) AS keep_f FROM c
)
SELECT d.doc_id, d.lang
FROM documents d JOIN f USING (lang)
WHERE f.keep_f >= 1.0
   OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      < printf('%08x', CAST(floor(f.keep_f * 4294967296.0) AS BIGINT))
"""
    )


QUERIES.update({"temperature_resample_bpe": q_temperature_resample_bpe})
ORACLES.update({"temperature_resample_bpe": _sql_temperature_resample_bpe()})


# --------------------------------------------------------------------------
# Naive-Bayes language ID over the classifier path (r5)
# --------------------------------------------------------------------------
# The hashed-feature classifier path carrying a REAL multiclass model:
# multinomial NB with add-one smoothing, trained deterministically
# in-engine from the corpus's own lang labels, decode = argmax. The
# oracle re-derives weights, priors, pooled-UNK base term, and the
# rounded argmax from the same parquet — equality pins training AND
# inference across engines.

_NB_DIM = 4096


def q_lang_id_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-predict NB lang-id; accuracy vs the generator's labels
    is pytested (tests/test_textstats.py::TestNbLangClassifier)."""
    from dedupe_trees_spark.operators.textstats import nb_lang_classifier

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return nb_lang_classifier(d, dim=_NB_DIM)


SQL_LANG_ID_CLASSIFIER = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS token
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % {_NB_DIM} AS INT) AS bucket,
         count(*) AS cnt
  FROM toks GROUP BY 1, 2
),
lab AS (SELECT doc_id, lang FROM documents),
bc AS (
  SELECT l.lang, f.bucket, sum(f.cnt) AS c
  FROM feats f JOIN lab l USING (doc_id) GROUP BY 1, 2
),
cm AS (SELECT lang, sum(c) AS T FROM bc GROUP BY lang),
dc AS (SELECT lang, count(*) AS nd FROM lab GROUP BY lang),
n AS (SELECT count(*) AS N FROM lab),
cs AS (
  SELECT cm.lang,
         ln(CAST(dc.nd AS DOUBLE)) - ln(CAST(n.N AS DOUBLE)) AS prior,
         ln(CAST(cm.T + {_NB_DIM} AS DOUBLE)) AS logZ
  FROM cm JOIN dc USING (lang) CROSS JOIN n
),
dt AS (SELECT doc_id, sum(cnt) AS n_terms FROM feats GROUP BY doc_id),
ss AS (
  SELECT f.doc_id, b.lang, sum(f.cnt * ln(CAST(b.c + 1 AS DOUBLE))) AS s
  FROM feats f JOIN bc b ON f.bucket = b.bucket GROUP BY 1, 2
),
scored AS (
  SELECT dt.doc_id, cs.lang,
         round(cs.prior - dt.n_terms * cs.logZ + COALESCE(ss.s, 0.0), 6) AS score
  FROM dt CROSS JOIN cs
  LEFT JOIN ss ON ss.doc_id = dt.doc_id AND ss.lang = cs.lang
),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scored
)
SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rn = 1
"""

QUERIES.update({"lang_id_classifier": q_lang_id_classifier})
ORACLES.update({"lang_id_classifier": SQL_LANG_ID_CLASSIFIER})
