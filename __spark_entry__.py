"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``dedupe_trees_spark`` (see SURVEY.md §2 / README.md).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full dedup semantics —
    content hashing → candidate edges → connected components → resolver
    window → canonical table with removals flagged."""
    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.exact import exact_edges, with_content_hash
    from dedupe_trees_spark.operators.resolve import resolve
    from dedupe_trees_spark.queries import documents_as_pages

    pages = documents_as_pages(spark, "/root/testdata/sf0.001")
    hashed = with_content_hash(pages, text_col="text")
    edges = exact_edges(hashed, id_col="url")
    comps = assign_components(pages.select("url"), edges, id_col="url")
    resolved = resolve(
        pages.join(comps, "url"),
        ["source_order", "path_depth", "copy_pattern", "arbitrary"],
    )
    return resolved.select(
        "component_id", "url", "lang", "source", "rank", "is_canonical"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dedupe_trees_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names)."""
    from dedupe_trees_spark.queries import ORACLES

    return dict(ORACLES)
