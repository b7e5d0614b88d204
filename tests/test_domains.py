"""Per-domain caps, host extraction, deterministic sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_trees_spark.operators.domains import (
    deterministic_sample,
    domain_cap,
    domain_cap_window,
    extract_domain,
    stratified_sample,
)


def test_extract_domain_variants(spark):
    rows = [
        (1, "https://www.Site3.COM:443/p/1?x=1#f"),
        (2, "HTTPS://site3.com/p/2"),
        (3, "http://sub.www.example.org:8080/"),
        (4, "ftp://WWW.files.net"),
    ]
    d = spark.createDataFrame(rows, ["id", "url"])
    got = {r["id"]: r["d"] for r in d.select("id", extract_domain("url").alias("d")).collect()}
    # leading www. strips; an interior ".www." does not
    assert got == {1: "site3.com", 2: "site3.com", 3: "sub.www.example.org", 4: "files.net"}


def _corpus(spark, n=400, hot_frac=0.7):
    """n docs, one hot domain holding hot_frac of them, 5 cold domains."""
    hot = int(n * hot_frac)
    rows = [(i, f"https://hot.com/p/{i:05d}", "hot.com") for i in range(hot)]
    rows += [
        (i, f"https://cold{i % 5}.com/p/{i:05d}", f"cold{i % 5}.com")
        for i in range(hot, n)
    ]
    return spark.createDataFrame(rows, ["doc_id", "url", "domain"])


def test_domain_cap_matches_window_formulation(spark):
    d = _corpus(spark)
    a = domain_cap(d, 25, salts=8).select("doc_id", "domain")
    b = domain_cap_window(d, 25).select("doc_id", "domain")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # hot domain exactly at the cap; under-cap domains keep everything
    sizes = {r["domain"]: r["n"] for r in a.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert sizes["hot.com"] == 25
    assert all(v <= 25 for v in sizes.values())


def test_domain_cap_deterministic_across_partitionings(spark):
    d = _corpus(spark)
    a = domain_cap(d, 10, salts=4).select("doc_id").collect()
    b = domain_cap(d.repartition(13, "doc_id"), 10, salts=32).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)


def test_domain_cap_under_cap_domains_untouched(spark):
    d = _corpus(spark, n=40, hot_frac=0.25)  # every domain < cap
    assert domain_cap(d, 100).count() == 40


def test_domain_cap_plan_is_window_free(spark):
    d = _corpus(spark)
    plan = domain_cap(d, 25)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # thresholds side broadcast


def test_deterministic_sample_reproducible_and_sized(spark):
    d = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = deterministic_sample(d, 0.3).collect()
    b = deterministic_sample(d.repartition(7), 0.3).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    assert abs(len(a) / 20000 - 0.3) < 0.02  # md5 uniformity
    # edges: frac 0 keeps nothing, frac 1 keeps everything
    assert deterministic_sample(d, 0.0).count() == 0
    assert deterministic_sample(d, 1.0).count() == 20000


def test_stratified_sample_respects_per_stratum_fractions(spark):
    d = spark.range(0, 30000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_sample(d, {"en": 0.5}, "lang", default_frac=0.1)
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 10000 - 0.5) < 0.03
    assert abs(counts["de"] / 20000 - 0.1) < 0.03
    # membership is per-key deterministic: the en subset at 0.5 contains
    # the en subset at 0.25 (thresholds nest)
    k25 = stratified_sample(d, {"en": 0.25}, "lang", default_frac=0.0)
    assert k25.exceptAll(kept).count() == 0


def test_sample_rejects_bad_fraction(spark):
    d = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        deterministic_sample(d, 1.5).count()
    with pytest.raises(ValueError):
        domain_cap(d.withColumn("domain", F.lit("x")).withColumn("url", F.lit("u")), 0)


def test_block_urls_domains_and_patterns(spark):
    from dedupe_trees_spark.operators.domains import block_urls

    rows = [
        (1, "https://spam.com/a"),
        (2, "https://WWW.Spam.COM:443/b"),   # same domain after extraction
        (3, "https://ok.com/fine"),
        (4, "https://ok.com/download.exe"),  # pattern-blocked
        (5, "https://also-ok.org/x"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = block_urls(
        d, blocked_domains=["spam.com"], url_patterns=[r"\.exe$"]
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 5]
    # blocklist as a DataFrame works identically
    bl = spark.createDataFrame([("spam.com",)], ["domain"])
    kept2 = block_urls(d, blocked_domains=bl, url_patterns=[r"\.exe$"])
    assert sorted(r["doc_id"] for r in kept2.collect()) == [3, 5]
    # no-op configuration keeps everything
    assert block_urls(d).count() == 5
    # plan: anti-join is broadcast, corpus side not exchanged
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan


def test_extract_links_and_outlink_stats(spark):
    from dedupe_trees_spark.operators.domains import extract_links, outlink_stats

    rows = [
        (1, '<a href="https://a.com/x">1</a><a href="http://www.b.com:80/y">2</a>'),
        (2, '<a href="https://a.com/z?q=1">3</a> no more links'),
        (3, "plain text, zero anchors"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {r["doc_id"]: r["l"] for r in df.select("doc_id", extract_links("html").alias("l")).collect()}
    assert got[1] == ["https://a.com/x", "http://www.b.com:80/y"]
    assert got[2] == ["https://a.com/z?q=1"] and got[3] == []
    stats = {r["domain"]: (r["n_links"], r["n_docs"]) for r in outlink_stats(df).collect()}
    assert stats == {"a.com": (2, 2), "b.com": (1, 1)}


# ---------------------------------------------------------------------------
# temperature_resample


def _lang_corpus(spark):
    rows = []
    for lang, n in [("en", 600), ("fr", 150), ("de", 60)]:
        rows += [(len(rows) + i, lang) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_temperature_resample_alpha_half_counts(spark):
    from dedupe_trees_spark.operators.domains import temperature_resample

    d = _lang_corpus(spark)
    kept = temperature_resample(d, "lang", 0.5, "doc_id")
    got = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    # min stratum kept whole (no hash test at keep_f == 1.0)
    assert got["de"] == 60
    # expected kept_l = c_l * sqrt(c_min/c_l) = sqrt(c_min * c_l)
    import math

    for lang, c in [("en", 600), ("fr", 150)]:
        exp = math.sqrt(60 * c)
        assert abs(got[lang] - exp) < 4 * math.sqrt(exp) + 5, (lang, got[lang], exp)


def test_temperature_resample_alpha_bounds(spark):
    from dedupe_trees_spark.operators.domains import temperature_resample

    d = _lang_corpus(spark)
    # alpha=1 -> keep_f = 1 for every stratum: identity
    assert temperature_resample(d, "lang", 1.0, "doc_id").count() == d.count()
    with pytest.raises(ValueError):
        temperature_resample(d, "lang", 1.5, "doc_id")


def test_temperature_resample_partition_invariant(spark):
    from dedupe_trees_spark.operators.domains import temperature_resample

    d = _lang_corpus(spark)
    a = sorted(r["doc_id"] for r in temperature_resample(d, "lang", 0.5).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(d.repartition(13), "lang", 0.5).collect()
    )
    assert a == b and len(a) > 0
