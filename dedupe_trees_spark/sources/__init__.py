"""Input sources for pages tables (parquet default, Iceberg seam,
schema'd JSONL/CSV for raw dumps, WARC for Common-Crawl archives)."""

from dedupe_trees_spark.sources.pages import (
    PAGES_SCHEMA,
    read_pages_any,
    read_pages_csv,
    read_pages_jsonl,
)
from dedupe_trees_spark.sources.warc import (
    read_pages_warc,
    warc_bytes,
    write_pages_warc,
    write_warc,
)

__all__ = [
    "PAGES_SCHEMA",
    "read_pages_any",
    "read_pages_csv",
    "read_pages_jsonl",
    "read_pages_warc",
    "warc_bytes",
    "write_pages_warc",
    "write_warc",
]
