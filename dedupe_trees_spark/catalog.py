"""Iceberg catalog layer behind the io.py seam (north rule: "Iceberg
tables of Common-Crawl-style web pages").

No Iceberg runtime jar ships in this sandbox (verified — SURVEY.md §7),
so everything here is the *declarative* surface a real deployment
applies: the session conf that registers the catalog, the DDL that
creates the pages table with a scale-appropriate partition spec, and a
guarded ``ensure_pages_table`` that executes the DDL only when a catalog
is actually configured. ``io.read_pages`` already resolves
``iceberg:<table>`` inputs through ``spark.table`` so the rest of the
engine is storage-agnostic.

Partition spec rationale (10^12 docs): ``days(warc_ts)`` aligns with
crawl-batch ingest and gives the pipeline partition pruning on
incremental runs; ``bucket(N, url)`` spreads each day across N files so
no single writer task owns a day, and gives storage-level affinity for
the url-keyed joins at S5. Format v2 + merge-on-read keeps the
delete-sink (R11) cheap: removals become positional deletes instead of
rewriting data files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# BASELINE.json input_hint column set, in input order
PAGES_COLUMNS: tuple[tuple[str, str], ...] = (
    ("url", "STRING"),
    ("warc_ts", "TIMESTAMP"),
    ("html", "BINARY"),
    ("text", "STRING"),
    ("lang", "STRING"),
    ("source", "STRING"),
    ("source_order", "INT"),
)


def iceberg_session_conf(
    catalog: str = "dedupe",
    warehouse: str = "hdfs:///warehouse/dedupe",
    catalog_type: str = "hadoop",
) -> dict[str, str]:
    """Session/spark-submit conf that registers an Iceberg catalog.

    Pass these as ``--conf`` to spark-submit (or feed to
    ``session.get_spark(extra_conf=...)``) on a cluster where the
    iceberg-spark-runtime jar is on the classpath.
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def pages_table_ddl(
    table: str = "dedupe.web.pages",
    url_buckets: int = 512,
) -> str:
    """CREATE TABLE DDL for the Common-Crawl-style pages input table."""
    cols = ",\n  ".join(f"{name} {typ}" for name, typ in PAGES_COLUMNS)
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        "USING iceberg\n"
        f"PARTITIONED BY (days(warc_ts), bucket({url_buckets}, url))\n"
        "TBLPROPERTIES (\n"
        "  'format-version' = '2',\n"
        "  'write.delete.mode' = 'merge-on-read',\n"
        "  'write.target-file-size-bytes' = '536870912'\n"
        ")"
    )


def catalog_configured(spark: SparkSession, catalog: str = "dedupe") -> bool:
    """True when the named Iceberg catalog is registered in this session."""
    return spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None


def ensure_pages_table(
    spark: SparkSession,
    table: str = "dedupe.web.pages",
    url_buckets: int = 512,
) -> str:
    """Create the pages table if its catalog is configured; returns the
    applied DDL on success.

    Raises RuntimeError when the catalog is absent (e.g. this sandbox) —
    the DDL is embedded in the exception message so it can still be
    logged/applied out of band; the caller should fall back to parquet
    paths, which ``read_pages`` handles transparently.
    """
    ddl = pages_table_ddl(table, url_buckets=url_buckets)
    catalog = table.split(".", 1)[0]
    if not catalog_configured(spark, catalog):
        raise RuntimeError(
            f"Iceberg catalog {catalog!r} is not configured in this session; "
            f"apply iceberg_session_conf() at submit time. DDL:\n{ddl}"
        )
    spark.sql(ddl)
    return ddl
