"""Crawl-lifecycle operator: snapshot-over-snapshot diff.

A Common-Crawl-style corpus is a sequence of crawl snapshots; the first
question a pipeline asks of a new snapshot is "what changed?" — added
urls enter the dedup index (``plans/incremental.py``), vanished urls
leave the serving set, changed pages re-enter candidate generation,
unchanged pages are skipped entirely (the dominant class crawl-over-
crawl, and the whole point: at 10^12 urls you must not re-dedup pages
that did not change). This is the web-scale generalization of the
reference's compare-two-trees framing (SURVEY.md §2.1 R1-R3): two
crawls ARE two trees, and the diff classes map onto its duplicate-set
vocabulary (unchanged = exact dup across snapshots).

Scale shape: ONE join on the url key. Urls are unique per side after
each side's re-crawl collapse (``plans/pipeline.py`` repair stage), so
the key is uniform — a primary key can't skew — and AQE picks
sort-merge for two big snapshots or broadcast when one side is a small
delta crawl. Content comparison rides the join row via map-side
xxhash64 fingerprints (the same content-identity the exact dedup stage
uses), never a second pass over the texts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ADDED = "added"
VANISHED = "vanished"
CHANGED = "changed"
UNCHANGED = "unchanged"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Classify every key of two crawl snapshots.

    Returns one row per url in either snapshot: (key_col, status) with
    status ∈ {added, vanished, changed, unchanged} — added/vanished from
    the full-outer join's null sides, changed/unchanged by comparing
    64-bit content fingerprints computed map-side under the join.
    """
    fa = old.select(
        F.col(key_col).alias("_k"), F.xxhash64(content_col).alias("_fp_old")
    )
    fb = new.select(
        F.col(key_col).alias("_k"), F.xxhash64(content_col).alias("_fp_new")
    )
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit(ADDED))
        .when(F.col("_fp_new").isNull(), F.lit(VANISHED))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit(UNCHANGED))
        .otherwise(F.lit(CHANGED))
    )
    return fa.join(fb, "_k", "full_outer").select(
        F.col("_k").alias(key_col), status.alias("status")
    )
