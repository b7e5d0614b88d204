"""Engine-vs-oracle frame diffs via exceptAll (SURVEY.md §5.2): unlike
the driver's hash compare, a failing exceptAll diff shows WHICH rows
disagree, so regressions localize instantly. Used on integer/string
queries (float aggregates go through the hash compare's canonicalizer
instead — exceptAll on doubles would be bit-brittle)."""

from __future__ import annotations

import duckdb
import pytest

import dedupe_trees_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# integer/string-valued contract queries: safe for exact frame equality
DIFFABLE = [
    "exact_dup_groups",
    "canonical_pick",
    "rank_ties_survivors",
    "removal_manifest",
    "path_depth_copy_flags",
    "mod_date_resolution",
    "dup_set_histogram",
    "top_sources",
    "token_stats",
    "substring_dup_pairs",
    "substring_extent_pairs",
    "sessionize_events",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def assert_frames_equal(spark, engine_df, oracle_pdf):
    """Exact multiset equality both ways; prints offending rows on fail."""
    oracle_df = spark.createDataFrame(oracle_pdf, schema=engine_df.schema)
    extra = engine_df.exceptAll(oracle_df)
    missing = oracle_df.exceptAll(engine_df)
    n_extra, n_missing = extra.count(), missing.count()
    assert n_extra == 0 and n_missing == 0, (
        f"engine-only rows ({n_extra}): {extra.limit(5).collect()}\n"
        f"oracle-only rows ({n_missing}): {missing.limit(5).collect()}"
    )


@pytest.mark.parametrize("name", DIFFABLE)
def test_engine_matches_oracle_exceptall(spark, duck, name):
    engine_df = Q.QUERIES[name](spark, SF_DIR)
    oracle_pdf = duck.sql(Q.ORACLES[name]).df()
    assert_frames_equal(spark, engine_df, oracle_pdf)
