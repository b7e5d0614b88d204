"""dedupe_trees_spark — a from-scratch, PySpark-native near-duplicate
detection and clustering engine.

Generalizes the content-hash + resolution-rule semantics of the reference
tool ``davidmreed/dedupe_trees`` (a single-process filesystem deduplicator;
see SURVEY.md §2.1 for the operator inventory R1–R14) to Common-Crawl-style
web pages at cluster scale:

- exact dedup: ``xxhash64`` content hashing + hash aggregation
  (reference: FileCatalog digest grouping, SURVEY §2.1 R2–R3)
- near dup:    MinHash shingle signatures + LSH band hashing,
               SimHash Hamming buckets, exact-substring fingerprints
- clustering:  connected components (large-star/small-star) over the
               unioned candidate-pair graph (replaces the reference's
               tree-walk duplicate sets)
- resolution:  resolver chains (source-order, path-depth, copy-pattern,
               mod-date, arbitrary — reference R4–R8/R10) expressed as
               SQL window ranks
- sinks:       canonical table, removals manifest, sequester table
               (reference R11–R13) as DataFrame writes / anti-joins

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` on the
hot path, vectorized Arrow/pandas UDFs where Spark lacks a primitive,
zero per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
