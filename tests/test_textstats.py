from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.operators.textstats import (
    lang_id,
    occurrence_count,
    quality_score,
    token_count,
    word_token_count,
)


def test_occurrence_count(spark):
    df = spark.createDataFrame([("a the b the c",), ("nothing",)], ["t"])
    out = [r["n"] for r in df.select(occurrence_count("t", "the").alias("n")).collect()]
    assert out == [2, 0]


def test_lang_id_basic(spark):
    rows = [
        ("the cat and the dog is of note", "en"),
        ("le chat et la maison et les arbres", "fr"),
        ("el perro y los gatos que corren y", "es"),
        ("der hund und die katze und das haus", "de"),
        ("xyz qqq zzz", "und"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    out = [r["p"] for r in df.select(lang_id("text").alias("p")).collect()]
    assert out == [e for _, e in rows]


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, foo-bar 123!",)], ["text"])
    r = df.select(
        token_count("text").alias("ws"), word_token_count("text").alias("w")
    ).collect()[0]
    assert r["ws"] == 4
    # chunks: hello, world, foo, bar, 123 (5) + punct , - ! (3)
    assert r["w"] == 8


def test_quality_score_range_and_monotonicity(spark):
    rows = [
        ("good clean prose with many reasonable words here today ok fine",),
        ("!!!! ???? $$$$ #### %%%% ^^^^ &&&& ****",),
    ]
    df = spark.createDataFrame(rows, ["text"])
    out = quality_score(df).select("quality").collect()
    assert 0.0 <= out[1]["quality"] < out[0]["quality"] <= 1.0
