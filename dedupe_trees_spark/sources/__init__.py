"""Input sources for pages tables (parquet default, Iceberg seam,
schema'd JSONL/CSV for raw dumps)."""

from dedupe_trees_spark.sources.pages import (
    PAGES_SCHEMA,
    read_pages_any,
    read_pages_csv,
    read_pages_jsonl,
)

__all__ = ["PAGES_SCHEMA", "read_pages_any", "read_pages_csv", "read_pages_jsonl"]
