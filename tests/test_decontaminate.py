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


# --------------------------------------------------------------------------
# Fuzzy (MinHash-LSH) decontamination
# --------------------------------------------------------------------------


def _fuzzy_fixture(spark):
    """Eval doc 100 = w0..w39. Corpus: doc 1 = exact copy (J=1.0);
    doc 2 = paraphrase with tokens 9/19/29 replaced (38 shared of 47
    distinct 3-shingles -> J = 29/47 ~ 0.617, and every common token
    run is <= 10 so NO 13-gram survives); doc 3 = clean."""
    ev_toks = [f"w{i}" for i in range(40)]
    para = list(ev_toks)
    for i in (9, 19, 29):
        para[i] = f"x{i}"
    ev = _docs(spark, [(100, " ".join(ev_toks))])
    corpus = _docs(
        spark,
        [
            (1, " ".join(ev_toks)),
            (2, " ".join(para)),
            (3, " ".join(f"c{i}" for i in range(40))),
        ],
    )
    return corpus, ev


def test_fuzzy_catches_paraphrase_exact_rule_misses(spark):
    """The motivating case: a one-token-per-ten edit leaves no shared
    13-gram (exact rule clean) but shingle-Jaccard 0.617 (fuzzy dirty
    at tau=0.6)."""
    from dedupe_trees_spark.operators.decontaminate import (
        fuzzy_contamination_report,
    )

    corpus, ev = _fuzzy_fixture(spark)
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_report(corpus, ev, n=13).collect()
    }
    assert exact[2] is False  # paraphrase defeats the exact rule
    fuzzy = {
        r["doc_id"]: r
        for r in fuzzy_contamination_report(corpus, ev, tau=0.6).collect()
    }
    assert fuzzy[2]["contaminated"] is True
    assert abs(fuzzy[2]["max_jaccard"] - 29 / 47) < 1e-12
    assert fuzzy[1]["contaminated"] is True and fuzzy[1]["max_jaccard"] == 1.0
    assert fuzzy[3]["contaminated"] is False and fuzzy[3]["n_eval_docs"] == 0


def test_fuzzy_decontaminate_drops_exactly_the_flagged(spark):
    from dedupe_trees_spark.operators.decontaminate import (
        fuzzy_contamination_report,
        fuzzy_decontaminate,
    )

    corpus, ev = _fuzzy_fixture(spark)
    flagged = {
        r["doc_id"]
        for r in fuzzy_contamination_report(corpus, ev, tau=0.6).collect()
        if r["contaminated"]
    }
    kept = {r["doc_id"] for r in fuzzy_decontaminate(corpus, ev, tau=0.6).collect()}
    assert flagged == {1, 2}
    assert kept == {3}
    assert kept | flagged == {1, 2, 3}


def test_fuzzy_tau_monotone(spark):
    from dedupe_trees_spark.operators.decontaminate import (
        fuzzy_contamination_report,
    )

    corpus, ev = _fuzzy_fixture(spark)

    def dirty(tau):
        return {
            r["doc_id"]
            for r in fuzzy_contamination_report(corpus, ev, tau=tau).collect()
            if r["contaminated"]
        }

    assert dirty(0.95) <= dirty(0.6) <= dirty(0.3)
    assert dirty(0.95) == {1}  # only the exact copy survives tau=0.95


def test_fuzzy_plan_broadcasts_eval_never_shuffle_joins(spark):
    """Every join in the fuzzy pass must be broadcast (eval side or
    candidate-id side) — a SortMergeJoin would mean the corpus shuffled
    on a join key, the exact thing the zero-corpus-shuffle discipline
    forbids."""
    from dedupe_trees_spark.operators.decontaminate import (
        fuzzy_contamination_report,
    )

    corpus, ev = _fuzzy_fixture(spark)
    plan = (
        fuzzy_contamination_report(corpus, ev, tau=0.6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
