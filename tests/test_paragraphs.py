"""Paragraph-level dedup, repetition quality signals, URL canonicals."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import normalize_url
from dedupe_trees_spark.operators.paragraphs import (
    explode_paragraphs,
    keep_first_occurrences,
    paragraph_dedup,
    paragraph_dup_stats,
    token_chunk_paragraphs,
)
from dedupe_trees_spark.operators.textstats import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_explode_paragraphs_real_separator(spark):
    d = _docs(spark, [(1, "intro\n\nbody one\n\n\n\nbody two"), (2, "solo")])
    out = explode_paragraphs(d).orderBy("doc_id", "pos").collect()
    # the empty paragraph from "\n\n\n\n" is dropped but positions keep
    # their original split indices
    assert [(r["doc_id"], r["pos"], r["para"]) for r in out] == [
        (1, 0, "intro"),
        (1, 1, "body one"),
        (1, 3, "body two"),
        (2, 0, "solo"),
    ]


def test_token_chunk_paragraphs_shapes(spark):
    d = _docs(spark, [(1, "a b c d e")])
    out = token_chunk_paragraphs(d, chunk=2).orderBy("pos").collect()
    assert [(r["pos"], r["para"]) for r in out] == [
        (0, "a b"), (1, "c d"), (2, "e"),
    ]


def test_paragraph_dup_stats_counts(spark):
    paras = spark.createDataFrame(
        [(1, 0, "x"), (1, 1, "x"), (2, 0, "x"), (2, 1, "y"), (3, 0, "z")],
        ["doc_id", "pos", "para"],
    )
    out = {r["para"]: (r["n_docs"], r["n_occ"]) for r in paragraph_dup_stats(paras).collect()}
    assert out == {"x": (2, 3)}  # y, z occur once -> excluded


def test_keep_first_occurrence_global_rule(spark):
    paras = spark.createDataFrame(
        [
            (1, 0, "dup"), (1, 1, "uniq1"), (1, 2, "dup"),  # intra-doc repeat
            (2, 0, "dup"), (2, 1, "uniq2"),
            (3, 0, "dup"),                                   # fully boilerplate doc
        ],
        ["doc_id", "pos", "para"],
    )
    kept = {(r["doc_id"], r["pos"]) for r in keep_first_occurrences(paras).collect()}
    assert kept == {(1, 0), (1, 1), (2, 1)}


def test_paragraph_dedup_rebuild_and_empty_doc(spark):
    docs = _docs(
        spark,
        [(1, "dup\n\nuniq1\n\ndup"), (2, "dup\n\nuniq2"), (3, "dup")],
    )
    paras = explode_paragraphs(docs)
    out = {
        r["doc_id"]: r["clean_text"]
        for r in paragraph_dedup(docs, paras).collect()
    }
    # one row per input doc; doc 3 (pure boilerplate) comes back empty
    assert out == {1: "dup\n\nuniq1", 2: "uniq2", 3: ""}


def test_repetition_features_hand_values(spark):
    # chunk=2 lines: ["a b","a b","c d"]; bigrams: a b, b a, a b, b c, c d
    d = _docs(spark, [(1, "a b a b c d"), (2, "x")])
    out = {r["doc_id"]: r for r in repetition_features(d, chunk=2).collect()}
    r1 = out[1]
    assert r1["n_lines"] == 3
    assert abs(r1["dup_line_frac"] - (1 - 2 / 3)) < 1e-7
    assert abs(r1["dup_line_char_frac"] - 6 / 9) < 1e-7  # 2 dup lines x 3 chars / 9
    assert abs(r1["top_bigram_frac"] - 2 / 5) < 1e-7  # "a b" twice in 5 slots
    r2 = out[2]  # single token: one line, no bigrams
    assert (r2["n_lines"], r2["dup_line_frac"], r2["top_bigram_frac"]) == (1, 0.0, 0.0)


def test_normalize_url_rules(spark):
    cases = [
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=3&fbclid=z#frag",
         "https://ex.com/a/b?id=3"),
        ("http://ex.com:80/", "http://ex.com/"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),  # non-default port kept
        ("https://ex.com", "https://ex.com/"),             # empty path -> /
        ("https://ex.com/a?b=2&a=1", "https://ex.com/a?b=2&a=1"),  # order kept
        ("https://sub.www.ex.com/a", "https://sub.www.ex.com/a"),  # only LEADING www.
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    out = [r["n"] for r in df.select(normalize_url("url").alias("n")).collect()]
    assert out == [e for _, e in cases]


def test_pipeline_normalize_urls_collapses_variants(spark, tmp_path):
    """End-to-end: with normalize_urls on, messy crawl variants of one
    page share a nid and the S1 re-crawl audit collapses them to the
    latest crawl — one canonical row, no kept/removed overlap."""
    from dedupe_trees_spark.config import PipelineConfig, from_args
    from dedupe_trees_spark.plans.pipeline import DedupePipeline

    rows = [
        ("https://www.ex.com/p/1?utm_source=a", "2024-01-01 00:00:00", "body one " * 30),
        ("HTTPS://ex.com:443/p/1/", "2024-02-01 00:00:00", "body one newer " * 30),
        ("https://ex.com/p/2", "2024-01-01 00:00:00", "second page " * 30),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "text"]).select(
        "url",
        F.col("warc_ts").cast("timestamp"),
        "text",
        F.lit("en").alias("lang"),
        F.lit("src1").alias("source"),
    )
    inp = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(inp)
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(
        input_path=inp, ckpt_dir=ckpt, normalize_urls=True, bucket_cap=16
    )
    pipe = DedupePipeline(spark, cfg)
    pipe.run()

    sigs = spark.read.parquet(f"{ckpt}/signatures")
    assert sigs.count() == 2  # the two /p/1 variants collapsed
    kept_p1 = sigs.filter(F.col("url") == "https://ex.com/p/1").collect()
    assert len(kept_p1) == 1 and "newer" in kept_p1[0]["norm"]

    canon = pipe.canonical()
    assert canon.count() == 2
    assert {r["url"] for r in canon.collect()} == {
        "https://ex.com/p/1", "https://ex.com/p/2",
    }

    # the CLI surface reaches the flag
    assert from_args(
        ["--input", inp, "--ckpt", ckpt, "--normalize-urls"]
    ).normalize_urls


def test_paragraph_dedup_matches_groupby_vs_window_formulations(spark):
    """The skew-safe groupBy+join-back keeper must equal the textbook
    row_number-window rule on a corpus with heavy boilerplate."""
    from pyspark.sql import Window

    docs = _docs(
        spark,
        [(i, f"boiler plate text\n\nunique body {i}\n\nboiler plate text") for i in range(50)],
    )
    paras = explode_paragraphs(docs)
    got = keep_first_occurrences(paras)
    w = Window.partitionBy("para").orderBy("doc_id", "pos")
    want = (
        paras.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_preclean_paragraphs_rewrites_text_preserves_rows(spark):
    from dedupe_trees_spark.operators.paragraphs import preclean_paragraphs

    rows = [
        ("u1", "boiler\n\nbody one"),
        ("u2", "boiler\n\nbody two"),
        ("u3", "boiler"),            # pure boilerplate -> emptied
        ("u2", "boiler\n\nbody two"),  # byte-identical re-crawl row
    ]
    pages = spark.createDataFrame(rows, ["url", "text"])
    out = preclean_paragraphs(pages)
    got = sorted((r["url"], r["text"]) for r in out.collect())
    # row count preserved; every body paragraph survives in its doc;
    # exactly ONE row keeps the boilerplate (keeper order is the
    # deterministic content-hash key, not url order); the two
    # byte-identical u2 re-crawl rows get the identical cleaned text
    assert len(got) == 4
    # exactly one DISTINCT document keeps the boilerplate (identical
    # re-crawl rows fan the keeper's cleaned text back to every copy)
    assert len({(u, t) for u, t in got if "boiler" in t}) == 1
    u2 = [t for u, t in got if u == "u2"]
    assert len(u2) == 2 and u2[0] == u2[1] and "body two" in u2[0]
    assert any("body one" in t for u, t in got if u == "u1")
    # determinism: a second run produces the identical relation
    got2 = sorted((r["url"], r["text"]) for r in preclean_paragraphs(pages).collect())
    assert got2 == got


def test_pipeline_paragraph_dedup_declusters_boilerplate_neardups(spark, tmp_path):
    """The CCNet composition changes clustering the right way: two docs
    that share a DOMINANT boilerplate block but have unrelated bodies
    are near-dups on raw text (shingle Jaccard over mostly-boilerplate
    shingles) and NOT dups once the pre-clean strips the boilerplate."""
    from pyspark.sql import functions as F

    from dedupe_trees_spark.config import PipelineConfig, from_args
    from dedupe_trees_spark.plans.pipeline import DedupePipeline

    boiler = " ".join(f"nav{i} cookie banner legal footer" for i in range(40))
    rows = [
        ("https://a.ex/1", boiler + "\n\nalpha prose only here " * 2),
        ("https://a.ex/2", boiler + "\n\nbeta completely different words " * 2),
        ("https://a.ex/3", "unrelated third document body " * 20),
    ]
    pages = spark.createDataFrame(rows, ["url", "text"]).select(
        "url",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        "text",
        F.lit("en").alias("lang"),
        F.lit("src1").alias("source"),
    )
    inp = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(inp)

    def components(ckpt: str, **kw) -> int:
        cfg = PipelineConfig(input_path=inp, ckpt_dir=ckpt, bucket_cap=16, **kw)
        DedupePipeline(spark, cfg).run()
        comps = spark.read.parquet(f"{ckpt}/components")
        sigs = spark.read.parquet(f"{ckpt}/signatures").select("nid", "url", "norm")
        return comps, sigs

    comps_raw, _ = components(str(tmp_path / "ckpt_raw"))
    # raw: docs 1+2 cluster on the shared boilerplate
    assert comps_raw.select("component_id").distinct().count() == 2

    comps_clean, sigs_clean = components(
        str(tmp_path / "ckpt_clean"), paragraph_dedup=True
    )
    assert comps_clean.select("component_id").distinct().count() == 3
    # exactly one doc keeps the boilerplate block (keeper order is the
    # deterministic content key); every body survives in its own doc
    norms = {r["url"]: r["norm"] for r in sigs_clean.collect()}
    assert sum("cookie" in n for n in norms.values()) == 1
    assert "alpha" in norms["https://a.ex/1"]
    assert "beta" in norms["https://a.ex/2"]

    # CLI surface
    ns = from_args(["--input", inp, "--ckpt", "/tmp/x", "--paragraph-dedup"])
    assert ns.paragraph_dedup and ns.paragraph_sep == "\n\n"
