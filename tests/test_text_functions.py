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
