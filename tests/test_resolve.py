from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dedupe_trees_spark.operators.resolve import (
    apply_delete_sink,
    is_copy_pattern,
    path_depth,
    removals,
    resolve,
)

TS = datetime.datetime(2024, 1, 1)
TS2 = datetime.datetime(2024, 6, 1)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, ["component_id", "url", "source_order", "warc_ts"]
    )


def test_source_order_resolver(spark):
    df = _df(
        spark,
        [("c1", "https://b.example/x.html", 1, TS), ("c1", "https://a.example/y.html", 0, TS)],
    )
    out = resolve(df, ["source_order", "arbitrary"])
    canon = [r["url"] for r in out.collect() if r["is_canonical"]]
    assert canon == ["https://a.example/y.html"]


def test_path_depth_resolver(spark):
    df = _df(
        spark,
        [
            ("c1", "https://h.example/a/b/c/deep.html", 0, TS),
            ("c1", "https://h.example/shallow.html", 0, TS),
        ],
    )
    out = resolve(df, ["path_depth", "arbitrary"])
    canon = [r["url"] for r in out.collect() if r["is_canonical"]]
    assert canon == ["https://h.example/shallow.html"]


def test_mod_date_oldest_and_newest(spark):
    df = _df(
        spark,
        [("c1", "https://h/new.html", 0, TS2), ("c1", "https://h/old.html", 0, TS)],
    )
    assert [
        r["url"] for r in resolve(df, ["mod_date", "arbitrary"]).collect() if r["is_canonical"]
    ] == ["https://h/old.html"]
    assert [
        r["url"]
        for r in resolve(df, ["mod_date_newest", "arbitrary"]).collect()
        if r["is_canonical"]
    ] == ["https://h/new.html"]


def test_copy_pattern_resolver(spark):
    df = _df(
        spark,
        [
            ("c1", "https://h/docs/Copy of page7.html", 0, TS),
            ("c1", "https://h/docs/page7 (1).html", 0, TS),
            ("c1", "https://h/docs/page7 copy 2.html", 0, TS),
            ("c1", "https://h/docs/page7.html", 0, TS),
        ],
    )
    out = resolve(df, ["copy_pattern", "arbitrary"])
    canon = [r["url"] for r in out.collect() if r["is_canonical"]]
    assert canon == ["https://h/docs/page7.html"]


def test_tie_semantics_rank_keeps_all(spark):
    # identical keys all the way; non-arbitrary terminal → everyone survives (I2)
    df = _df(spark, [("c1", "https://h/a.html", 0, TS), ("c1", "https://h/b.html", 0, TS)])
    out = resolve(df, ["source_order", "mod_date"])
    assert all(r["is_canonical"] for r in out.collect())


def test_arbitrary_terminal_unique_survivor(spark):
    df = _df(spark, [("c1", "https://h/b.html", 0, TS), ("c1", "https://h/a.html", 0, TS)])
    out = resolve(df, ["source_order", "arbitrary"])
    canon = [r["url"] for r in out.collect() if r["is_canonical"]]
    assert canon == ["https://h/a.html"]  # deterministic: min url


def test_chain_order_matters(spark):
    # depth prefers u_shallow, but source_order first prefers u_deep
    df = _df(
        spark,
        [
            ("c1", "https://h/a/b/deep.html", 0, TS),
            ("c1", "https://h/shallow.html", 1, TS),
        ],
    )
    assert [
        r["url"]
        for r in resolve(df, ["source_order", "path_depth", "arbitrary"]).collect()
        if r["is_canonical"]
    ] == ["https://h/a/b/deep.html"]


def test_removals_and_delete_sink(spark):
    df = _df(spark, [("c1", "https://h/a.html", 0, TS), ("c1", "https://h/b.html", 1, TS)])
    resolved = resolve(df, ["source_order", "arbitrary"])
    rem = removals(resolved)
    assert [r["url"] for r in rem.collect()] == ["https://h/b.html"]
    kept = apply_delete_sink(df, rem)
    assert [r["url"] for r in kept.collect()] == ["https://h/a.html"]


def test_path_depth_expr(spark):
    df = spark.createDataFrame(
        [
            ("https://host/a/b/page.html",),
            ("https://host/page.html",),
            ("https://host/",),
            ("relative/two.html",),
        ],
        ["url"],
    )
    out = [r["d"] for r in df.select(path_depth("url").alias("d")).collect()]
    assert out == [3, 1, 0, 2]


def test_is_copy_pattern_expr(spark):
    cases = [
        ("https://h/Copy of x.html", 1),
        ("https://h/x copy.html", 1),
        ("https://h/x copy 12.html", 1),
        ("https://h/x (3).html", 1),
        ("https://h/x.html", 0),
        ("https://h/copyright.html", 0),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    out = [r["c"] for r in df.select(is_copy_pattern("url").alias("c")).collect()]
    assert out == [e for _, e in cases]


def test_quality_best_resolver_keeps_highest_quality(spark):
    from dedupe_trees_spark.operators.resolve import resolve

    df = spark.createDataFrame(
        [
            ("c1", "https://a", 0.9),
            ("c1", "https://b", 0.5),
            ("c2", "https://c", 0.7),
            ("c2", "https://d", 0.7),  # tie -> arbitrary terminal: min url
        ],
        ["component_id", "url", "quality"],
    )
    out = {
        r.component_id: r.url
        for r in resolve(df, ["quality_best", "arbitrary"])
        .filter("is_canonical")
        .collect()
    }
    assert out == {"c1": "https://a", "c2": "https://c"}
