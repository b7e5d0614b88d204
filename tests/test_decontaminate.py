"""Benchmark n-gram decontamination (operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_trees_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    ngram_rows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _corpus_and_eval(spark):
    # eval doc 100 carries the gram "a b c d e"; eval doc 101 carries
    # "v w x y z". corpus doc 1 contains the first, doc 2 contains both,
    # doc 3 is clean, doc 4 is shorter than n and can never be hit.
    ev = _docs(
        spark,
        [(100, "q q a b c d e q q"), (101, "v w x y z")],
    )
    corpus = _docs(
        spark,
        [
            (1, "m m a b c d e m m m"),
            (2, "a b c d e n n v w x y z"),
            (3, "entirely clean prose with no benchmark overlap at all"),
            (4, "a b c d"),
        ],
    )
    return corpus, ev


def test_ngram_rows_short_docs_emit_nothing(spark):
    d = _docs(spark, [(1, "a b c d e f"), (2, "a b c")])
    out = ngram_rows(d, n=5).collect()
    got = sorted((r["doc_id"], r["gram"]) for r in out)
    # doc 2 has 3 < 5 tokens: zero grams (no whole-doc fallback)
    assert got == [(1, "a b c d e"), (1, "b c d e f")]


def test_contamination_report_counts(spark):
    corpus, ev = _corpus_and_eval(spark)
    rep = {
        r["doc_id"]: (r["n_hit_grams"], r["n_eval_docs"], r["contaminated"])
        for r in contamination_report(corpus, ev, n=5).collect()
    }
    assert rep[1] == (1, 1, True)
    assert rep[2] == (2, 2, True)
    assert rep[3] == (0, 0, False)
    assert rep[4] == (0, 0, False)  # sub-n doc present and clean


def test_decontaminate_keeps_clean_rows_intact(spark):
    corpus, ev = _corpus_and_eval(spark)
    kept = decontaminate(corpus, ev, n=5).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [3, 4]
    # survivors keep their full row (byte-identical text)
    assert kept[0]["text"].startswith("entirely clean")


def test_hash_mode_matches_string_mode(spark):
    corpus, ev = _corpus_and_eval(spark)
    a = contamination_report(corpus, ev, n=5, join_on="gram")
    b = contamination_report(corpus, ev, n=5, join_on="hash")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    ka = decontaminate(corpus, ev, n=5, join_on="gram").select("doc_id")
    kb = decontaminate(corpus, ev, n=5, join_on="hash").select("doc_id")
    assert ka.exceptAll(kb).count() == 0 and kb.exceptAll(ka).count() == 0


def test_eval_side_is_broadcast_and_corpus_not_shuffled(spark):
    """The probe join and both join-backs must be broadcast, and the
    gram builds exchange-free (array_distinct, not dropDuplicates): the
    only hash Exchanges allowed in the whole report plan are the two
    countDistinct stages over MATCHED rows."""
    corpus, ev = _corpus_and_eval(spark)
    plan = (
        contamination_report(corpus, ev, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    # exactly one hash exchange: the countDistinct over matched grams
    # (it expands/repartitions on (doc_id, gram, _ev_id) then doc_id)
    n_hash_ex = plan.count("Exchange hashpartitioning")
    assert n_hash_ex <= 2, plan
    anti = (
        decontaminate(corpus, ev, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in anti
    assert "LeftAnti" in anti
