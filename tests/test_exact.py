from __future__ import annotations

from dedupe_trees_spark.operators.exact import (
    dup_set_summary,
    dup_sets,
    exact_edges,
    with_content_hash,
)


def _pages(spark):
    rows = [
        ("u1", "same text"),
        ("u2", "same text"),
        ("u3", "same text"),
        ("u4", "other text"),
        ("u5", "other text"),
        ("u6", "unique text"),
    ]
    return with_content_hash(spark.createDataFrame(rows, ["url", "text"]))


def test_dup_sets_keeps_only_duplicated_rows(spark):
    out = dup_sets(_pages(spark)).collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["u1", "u2", "u3", "u4", "u5"]
    counts = {r["url"]: r["dup_count"] for r in out}
    assert counts["u1"] == 3 and counts["u4"] == 2


def test_dup_set_summary(spark):
    out = {r["first_member"]: r["dup_count"] for r in dup_set_summary(_pages(spark)).collect()}
    assert out == {"u1": 3, "u4": 2}


def test_exact_edges_star_shape(spark):
    edges = sorted(
        (r["url_a"], r["url_b"]) for r in exact_edges(_pages(spark)).collect()
    )
    # star edges: members → group min; m-1 edges per group, no self edges
    assert edges == [("u1", "u2"), ("u1", "u3"), ("u4", "u5")]
