"""snapshot_diff classification + unigram_logprob semantics and plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import dedupe_trees_spark.queries as Q
from dedupe_trees_spark.operators.crawl import snapshot_diff
from dedupe_trees_spark.operators.textstats import unigram_logprob

SF_DIR = "/root/testdata/sf0.001"


def test_snapshot_diff_classifies_all_four_states(spark):
    old = spark.createDataFrame(
        [("a", "same"), ("b", "before"), ("c", "gone")], ["url", "text"]
    )
    new = spark.createDataFrame(
        [("a", "same"), ("b", "after"), ("d", "fresh")], ["url", "text"]
    )
    got = {r.url: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        "a": "unchanged", "b": "changed", "c": "vanished", "d": "added"
    }


def test_snapshot_diff_covers_union_of_keys(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = snapshot_diff(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 3 == 0),
        key_col="doc_id",
    )
    assert out.count() == d.filter(
        (F.col("doc_id") % 2 == 0) | (F.col("doc_id") % 3 == 0)
    ).count()
    # identical text on both sides -> every shared key is unchanged
    assert out.filter(F.col("status") == "changed").count() == 0


def test_unigram_logprob_hand_computed(spark):
    # corpus: 'a' x4, 'b' x2 -> with min_count=2 both in vocab;
    # total=6, p(a)=4/6, p(b)=2/6
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a a b")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in unigram_logprob(df, min_count=2).collect()}
    want = round((2 * math.log(4 / 6) + math.log(2 / 6)) / 3, 6)
    assert rows[1].n_tokens == 3
    assert rows[1].logprob == want == rows[2].logprob


def test_unigram_logprob_unk_pools_rare_mass(spark):
    # 'x' and 'y' are singletons under min_count=2 -> both score the
    # POOLED unk mass p(UNK)=2/6, not 1/6
    df = spark.createDataFrame(
        [(1, "a a x"), (2, "a a y")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in unigram_logprob(df, min_count=2).collect()}
    want = round((2 * math.log(4 / 6) + math.log(2 / 6)) / 3, 6)
    assert rows[1].logprob == want == rows[2].logprob


def test_unigram_logprob_vocab_join_is_broadcast(spark):
    df = unigram_logprob(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), min_count=5
    )
    df.collect()
    plan = df._jdf.queryExecution().toString()
    # the token-key join must be broadcast (skew design: a shuffle join
    # on the token key funnels every 'the' into one partition)
    assert "BroadcastHashJoin" in plan
    left, _, _ = plan.partition("BroadcastHashJoin")
    assert "SortMergeJoin" not in plan


def test_calibration_hist_mass_matches_threshold_query(spark):
    hist = {
        r.j_bin: r.n_pairs
        for r in Q.QUERIES["jaccard_calibration_hist"](spark, SF_DIR).collect()
    }
    ge08 = Q.QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).count()
    assert sum(n for b, n in hist.items() if b >= 0.8) == ge08
    assert all(0.0 <= b <= 1.0 for b in hist)


def test_tfidf_keywords_hand_computed(spark):
    # doc1: 'a a b', doc2: 'a c' ; n=2, df(a)=2, df(b)=1, df(c)=1
    # idf(a)=ln(1)=0 -> score 0; b/c score ln(2)
    df = spark.createDataFrame([(1, "a a b"), (2, "a c")], ["doc_id", "text"])
    from dedupe_trees_spark.operators.textstats import tfidf_keywords

    rows = {
        (r.doc_id, r.rank): (r.term, r.score)
        for r in tfidf_keywords(df, k=2, hot_df=2).collect()
    }
    ln2 = round(math.log(2), 6)
    assert rows[(1, 1)] == ("b", ln2)
    assert rows[(1, 2)] == ("a", 0.0)  # tie-free: score desc then term asc
    assert rows[(2, 1)] == ("c", ln2)
    assert rows[(2, 2)] == ("a", 0.0)


def test_tfidf_skew_split_has_both_join_legs(spark):
    out = Q.QUERIES["tfidf_keywords"](spark, SF_DIR)
    out.collect()
    plan = out._jdf.queryExecution().toString()
    # the hot leg is broadcast BY CONSTRUCTION (explicit hint — holds at
    # any scale); the cold leg's physical shape is deliberately left to
    # Spark (cold keys are safe under any strategy; AQE broadcasts it at
    # fixture scale). Pin the union-of-two-joins structure + the hint.
    assert "BroadcastHashJoin" in plan
    assert "Union" in plan
    phys = plan.split("== Physical Plan ==")[-1]
    assert phys.count("Join") >= 2
