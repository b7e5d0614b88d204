from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.functions.text import (
    char_ngrams,
    content_hash,
    fingerprint_md5,
    normalize_text,
    shingle_hashes,
    word_shingles,
)


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello   WORLD\tfoo\n",)], ["text"])
    out = df.select(normalize_text("text").alias("t")).collect()[0]["t"]
    assert out == "hello world foo"


def test_content_hash_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",), ("abd",)], ["text"])
    h = [r["h"] for r in df.select(content_hash("text").alias("h")).collect()]
    assert h[0] == h[1] != h[2]


def test_fingerprint_md5_matches_known(spark):
    df = spark.createDataFrame([("hello",)], ["text"])
    out = df.select(fingerprint_md5("text").alias("f")).collect()[0]["f"]
    assert out == "5d41402abc4b2a76b9719d911017c592"


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    rows = df.select(word_shingles("text", k=3).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    # short doc: single shingle of everything
    assert rows[1]["s"] == ["a b"]


def test_shingle_hashes_distinct_and_stable(spark):
    df = spark.createDataFrame([("a b c a b c a b c",)], ["text"])
    out = df.select(shingle_hashes("text", k=3).alias("h")).collect()[0]["h"]
    # 7 shingles but only 3 distinct ("a b c", "b c a", "c a b")
    assert len(out) == 3
    assert all(isinstance(x, int) for x in out)


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcdef",), ("ab",)], ["text"])
    rows = df.select(char_ngrams("text", k=4, stride=1).alias("g")).collect()
    assert rows[0]["g"] == ["abcd", "bcde", "cdef"]
    assert rows[1]["g"] == []


def test_char_ngrams_stride(spark):
    df = spark.createDataFrame([("abcdefgh",)], ["text"])
    out = df.select(char_ngrams("text", k=3, stride=2).alias("g")).collect()[0]["g"]
    assert out == ["abc", "cde", "efg"]


def test_html_to_text_rules(spark):
    from dedupe_trees_spark.functions.text import html_to_text

    rows = [
        (1, "<html><body>plain text here</body></html>", "plain text here"),
        (2, "<html><head><script>var x=1;</script><style>p{}</style></head>"
            "<body>a <b>bold</b> move</body></html>", "a bold move"),
        (3, "<p>x &amp;amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>",
            "x &amp; y <tag> \"q\" 's'"),
        (4, "<!-- c --><div>kept</div><!-- multi\nline -->", "kept"),
        (5, "no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "html", "want"])
    bad = df.select("id", html_to_text("html").alias("got"), "want").filter(
        "got != want"
    )
    assert bad.count() == 0


def test_html_extraction_byte_identical_on_pages(spark):
    """input_hint invariant: decode(html) -> extract == text for every
    synthesized Common-Crawl-style page, byte-identical."""
    from dedupe_trees_spark.datagen import GenConfig, generate_pages
    from dedupe_trees_spark.functions.text import html_to_text

    pages = generate_pages(spark, GenConfig(n_docs=500, seed=3))
    got = pages.select(
        "url",
        html_to_text(F.decode(F.col("html"), "UTF-8")).alias("extracted"),
        "text",
    )
    assert got.filter("extracted != text").count() == 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map
