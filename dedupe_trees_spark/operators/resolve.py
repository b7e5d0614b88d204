"""Resolver chains → SQL window ranks (canonical selection).

The reference applies an ordered chain of resolvers to each duplicate
set; each rule narrows the survivors and ties flow to the next rule
(SURVEY.md §2.1 R4–R10, DeduplicateOperation.run + SortBasedDuplicateResolver).
Behavioral invariant I2 (SURVEY.md §3.1): survivor choice is the
lexicographic minimum over the ordered resolver-key tuple; ties after all
keys ⇒ all tied entries survive; an ``arbitrary`` terminal key ⇒ exactly
one survivor, deterministically.

Spark-native formulation: ONE window per duplicate set
(``partitionBy(component_id).orderBy(k1…kn)``) with

- ``rank()``        — reproduces keep-ties semantics (multiple rank-1 rows)
- ``row_number()``  — used when the chain ends in ``arbitrary`` (unique pick)

Resolver key catalog (reference analogues):

==================  =====================================================
``source_order``    R4  SourceOrderDuplicateResolver — earliest source wins
``path_depth``      R5  PathLengthDuplicateResolver — shallowest path wins
                        (``path_depth_deep`` = inverted preference)
``mod_date``        R6  ModificationDateDuplicateResolver — oldest wins
                        (``mod_date_newest`` = newest wins)
``copy_pattern``    R7  CopyPatternDuplicateResolver — names matching copy
                        artifacts ("Copy of X", "X copy 2", "X (1)") lose
``arbitrary``       R8  ArbitraryDuplicateResolver — deterministic unique
                        tiebreak on the id column
==================  =====================================================
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Copy-artifact patterns applied to the final path segment (filename) of a
# url. Mirrors the reference's CopyPatternDuplicateResolver regex family
# (SURVEY.md §2.1 R7): "Copy of X", "Copy (2) of X", "X copy", "X copy 3",
# "X (1)" — with or without an extension.
COPY_PATTERNS = [
    r"(?i)^copy(\s*\(\d+\))?\s+of\s+",      # Copy of X / Copy (2) of X
    r"(?i)\s+copy(\s*\d+)?(\.[^./]*)?$",    # X copy.ext / X copy 2.ext
    r"\s*\(\d+\)(\.[^./]*)?$",              # X (1).ext
]


def filename(col: Column | str) -> Column:
    """Final path segment of a url/path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.element_at(F.split(c, "/"), -1)


def path_depth(col: Column | str) -> Column:
    """Number of path components below the host.

    ``https://host/a/b/page.html`` → 3. Mirrors the reference's
    path-component count below the source root (R5), with the url host
    playing the role of the source root.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*/?", "")
    return F.when(F.length(stripped) == 0, F.lit(0)).otherwise(
        F.size(F.split(stripped, "/"))
    )


def is_copy_pattern(col: Column | str) -> Column:
    """1 if the filename looks like a copy artifact, else 0 (losers sort last)."""
    name = filename(col)
    cond = F.lit(False)
    for pat in COPY_PATTERNS:
        cond = cond | name.rlike(pat)
    return F.when(cond, F.lit(1)).otherwise(F.lit(0))


def resolver_key(name: str, url_col: str = "url", ts_col: str = "warc_ts") -> Column:
    """One named resolver → one ascending sort key (min = preferred)."""
    if name == "source_order":
        return F.col("source_order").asc()
    if name == "path_depth":
        return path_depth(url_col).asc()
    if name == "path_depth_deep":
        return path_depth(url_col).desc()
    if name == "copy_pattern":
        return is_copy_pattern(url_col).asc()
    if name == "mod_date":
        return F.col(ts_col).asc()
    if name == "mod_date_newest":
        return F.col(ts_col).desc()
    if name == "quality_best":
        # LLM-pipeline resolver: keep the highest-quality cluster member
        # (production dedup keeps the best page, not the min-id one).
        # Caller attaches a `quality` column first — e.g.
        # operators/textstats.py::quality_score — the chain mechanics
        # (rank/ties/arbitrary terminal) are identical to every other key.
        return F.col("quality").desc()
    if name == "arbitrary":
        return F.col(url_col).asc()
    raise ValueError(f"unknown resolver: {name!r}")


def resolve(
    df: DataFrame,
    resolvers: list[str],
    component_col: str = "component_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Apply a resolver chain to duplicate sets; adds rank + is_canonical.

    Uses ``rank()`` (keep-ties, invariant I2) unless the chain ends in
    ``arbitrary``, where ``row_number()`` guarantees a unique survivor.
    Rows with the same component share one window partition — a single
    shuffle on component_id.
    """
    if not resolvers:
        resolvers = ["arbitrary"]
    keys = [resolver_key(r, url_col=url_col, ts_col=ts_col) for r in resolvers]
    w = Window.partitionBy(component_col).orderBy(*keys)
    rank_fn = F.row_number() if resolvers[-1] == "arbitrary" else F.rank()
    return df.withColumn("rank", rank_fn.over(w)).withColumn(
        "is_canonical", F.col("rank") == 1
    )


def removals(resolved: DataFrame) -> DataFrame:
    """Non-survivors — the rows every sink acts on (invariant I3)."""
    return resolved.filter(~F.col("is_canonical"))


def apply_delete_sink(pages: DataFrame, removed: DataFrame, url_col: str = "url") -> DataFrame:
    """R11 delete-sink analogue: the deduped table = pages ∖ removals.

    Spark never mutates inputs, so "delete" is a left-anti join writing a
    new canonical table.
    """
    return pages.join(removed.select(url_col), url_col, "left_anti")


def apply_sequester_sink(
    pages: DataFrame,
    removed: DataFrame,
    dest: str,
    url_col: str = "url",
    partition_col: str = "source",
) -> None:
    """R12 sequester-sink analogue: move removals aside, preserving origin.

    The reference ``os.renames`` each removal under a sequester root
    keeping its relative path; here the full removed rows are written to
    a sequester table partitioned by their source (the lineage analogue
    of the original relative path).
    """
    full = pages.join(removed.select(url_col), url_col, "left_semi")
    writer = full.write.mode("overwrite")
    if partition_col in pages.columns:
        writer = writer.partitionBy(partition_col)
    writer.parquet(dest)


def write_manifest(removed: DataFrame, dest: str, url_col: str = "url") -> None:
    """R13 output-only sink: the removal list itself, one url per row
    (CSV so it is greppable exactly like the reference's text file)."""
    removed.select(url_col).write.mode("overwrite").csv(dest)
