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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import fingerprint_md5, tokens
from dedupe_trees_spark.operators import resolve as R

# ---------------------------------------------------------------------------
# helpers


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


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
SELECT source, count(*) AS n_docs, sum(n_chars) AS total_chars
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
    "dup_set_histogram": SQL_DUP_SET_HISTOGRAM,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_sources": SQL_TOP_SOURCES,
}
