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


def test_gopher_rules_hand_values(spark):
    from dedupe_trees_spark.operators.textstats import gopher_rules

    # 4 lines: a bullet line, an ellipsis-ended line, two normal ones
    # (1/3 of lines ellipsis-ended would trip the 0.3 Gopher bound).
    good = (
        "the cat sat with the dog and they have to be of note that day\n"
        "- first point here\n"
        "closing words trailing...\n"
        "a quiet final line"
    )
    junky = "#### #### #### 1234 5678 9999"
    df = spark.createDataFrame([(1, good), (2, junky)], ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in gopher_rules(df, min_words=5, max_words=100).collect()
    }
    g = out[1]
    assert g["n_words"] == 26 and g["n_lines"] == 4
    assert g["stop_hits"] == 8  # all eight Gopher stopwords present
    assert abs(g["bullet_frac"] - 1 / 4) < 1e-12
    assert abs(g["ellipsis_frac"] - 1 / 4) < 1e-12
    assert g["flag_alpha"] and g["flag_stop"] and g["gopher_keep"]
    j = out[2]
    # 6 words, 16 '#' symbols -> ratio 16/6 > 0.1; 2/6 alpha-free words
    assert j["flag_symbol_ratio"] is False
    assert j["flag_alpha"] is False and j["flag_stop"] is False
    assert j["gopher_keep"] is False


def test_gopher_rules_empty_and_single_word(spark):
    from dedupe_trees_spark.operators.textstats import gopher_rules

    df = spark.createDataFrame([(1, ""), (2, "word")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["n_words"] == 0 and out[1]["mean_word_len"] == 0.0
    assert out[2]["n_words"] == 1 and out[2]["mean_word_len"] == 4.0
    assert not out[1]["gopher_keep"] and not out[2]["gopher_keep"]


def test_hashing_features_hand_example(spark):
    from dedupe_trees_spark.operators.textstats import hashing_features
    import hashlib

    d = spark.createDataFrame(
        [(1, "a b a  c"), (2, "b"), (3, "")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashing_features(d, dim=64, id_col="doc_id").collect()
    }
    def b(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

    # doc 1: a x2 (one bucket), b, c; empty token from the double space
    # is dropped; doc 3 contributes nothing
    want = {(1, b("a")): 2, (1, b("b")): 1, (1, b("c")): 1, (2, b("b")): 1}
    assert got == want


def test_hashing_features_collisions_sum(spark):
    """Two distinct tokens landing in the same bucket (dim=1 forces
    it) must sum their counts, the defining hashing-trick behavior."""
    from dedupe_trees_spark.operators.textstats import hashing_features

    d = spark.createDataFrame([(7, "x y z x")], ["doc_id", "text"])
    rows = hashing_features(d, dim=1, id_col="doc_id").collect()
    assert len(rows) == 1 and rows[0]["bucket"] == 0 and rows[0]["cnt"] == 4


def test_hashing_features_plan_single_partial_agged_exchange(spark):
    from dedupe_trees_spark.operators.textstats import hashing_features

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        hashing_features(d, dim=512)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# Quality-classifier inference (linear_classifier_score / filter)
# --------------------------------------------------------------------------


def test_linear_classifier_score_hand_example(spark):
    from dedupe_trees_spark.operators.textstats import linear_classifier_score

    feats = spark.createDataFrame(
        [(1, 10, 2), (1, 20, 1), (2, 30, 4)], ["doc_id", "bucket", "cnt"]
    )
    weights = spark.createDataFrame([(10, 0.5), (20, -1.0)], ["bucket", "weight"])
    out = {r["doc_id"]: r for r in linear_classifier_score(feats, weights).collect()}
    # doc 1: (2*0.5 + 1*-1)/3 = 0 -> prob 0.5; doc 2: bucket 30 has no
    # weight -> 0-weight fallback still counts in the tf norm
    assert out[1]["n_terms"] == 3 and abs(out[1]["score"]) < 1e-12
    assert abs(out[1]["prob"] - 0.5) < 1e-12
    assert out[2]["n_terms"] == 4 and out[2]["score"] == 0.0

    biased = {
        r["doc_id"]: r["score"]
        for r in linear_classifier_score(feats, weights, bias=1.0).collect()
    }
    assert abs(biased[1] - 1.0) < 1e-12 and abs(biased[2] - 1.0) < 1e-12


def test_quality_classifier_filter_threshold_and_empty_docs(spark):
    from pyspark.sql import functions as F
    from dedupe_trees_spark.operators.textstats import (
        hashing_features,
        quality_classifier_filter,
    )

    corpus = spark.createDataFrame(
        [(1, "good text here"), (2, "bad stuff"), (3, "")],
        ["doc_id", "text"],
    )
    feats = hashing_features(corpus, dim=64)
    # weights chosen from doc 1's own buckets -> doc 1 positive, doc 2 has
    # zero matched weight (score 0, prob 0.5); doc 3 empty -> no features
    w_pos = feats.filter("doc_id = 1").select("bucket").distinct().withColumn(
        "weight", F.lit(2.0)
    )
    kept = {
        r["doc_id"]
        for r in quality_classifier_filter(corpus, w_pos, threshold=0.6, dim=64).collect()
    }
    assert kept == {1}
    kept_half = {
        r["doc_id"]
        for r in quality_classifier_filter(corpus, w_pos, threshold=0.5, dim=64).collect()
    }
    assert kept_half == {1, 2}  # empty doc 3 never passes (no feature rows)


def test_linear_classifier_plan_broadcast_model_one_exchange(spark):
    """The model join must be broadcast (a shuffle join on the bucket key
    funnels stopword buckets into single partitions) and the per-doc agg
    the only exchange, map-side combined."""
    from dedupe_trees_spark.operators.textstats import linear_classifier_score

    feats = spark.createDataFrame(
        [(1, 10, 2), (2, 30, 4)], ["doc_id", "bucket", "cnt"]
    )
    weights = spark.createDataFrame([(10, 0.5)], ["bucket", "weight"])
    plan = (
        linear_classifier_score(feats, weights)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


class TestNbLangClassifier:
    """NB lang-id (operators/textstats.py::nb_lang_classifier).

    The driver fixture's lang labels are INDEPENDENT of its text (every
    lang draws from the same 31-word pool — verified round 5), so no
    classifier can beat the majority prior there; the fixture's role is
    engine parity (lang_id_classifier contract query). Accuracy is
    asserted here on a deterministic label-correlated corpus instead.
    """

    VOCAB = {
        "en": ["the", "and", "of", "house", "water", "night"],
        "fr": ["le", "la", "et", "maison", "eau", "nuit"],
        "de": ["der", "und", "das", "haus", "wasser", "nacht"],
    }

    def _corpus(self, spark, n_per_lang=60, mix=0.15):
        # deterministic doc i of lang l: mostly lang vocab, a fixed
        # minority of shared/other tokens (no RNG — index arithmetic)
        langs = sorted(self.VOCAB)
        rows = []
        did = 0
        for li, lang in enumerate(langs):
            v = self.VOCAB[lang]
            other = self.VOCAB[langs[(li + 1) % len(langs)]]
            for i in range(n_per_lang):
                toks = [v[(i + j) % len(v)] for j in range(20)]
                n_noise = int(20 * mix)
                for j in range(n_noise):
                    toks[(i + 3 * j) % 20] = other[(i + j) % len(other)]
                rows.append((did, lang, " ".join(toks)))
                did += 1
        return spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    def test_train_accuracy_on_separable_corpus(self, spark):
        from dedupe_trees_spark.operators.textstats import nb_lang_classifier

        d = self._corpus(spark)
        pred = nb_lang_classifier(d, dim=4096)
        j = pred.join(d.select("doc_id", "lang"), "doc_id")
        n = j.count()
        acc = j.filter("pred_lang = lang").count() / n
        assert n == 180
        assert acc >= 0.95, acc

    def test_empty_docs_absent(self, spark):
        from dedupe_trees_spark.operators.textstats import nb_lang_classifier

        d = spark.createDataFrame(
            [(0, "en", "the and of"), (1, "fr", ""), (2, "fr", "le la et")],
            ["doc_id", "lang", "text"],
        )
        out = {r["doc_id"] for r in nb_lang_classifier(d).collect()}
        assert out == {0, 2}

    def test_deterministic_tiebreak(self, spark):
        from dedupe_trees_spark.operators.textstats import nb_lang_classifier

        # two langs, perfectly symmetric corpora -> identical rounded
        # scores; the lexicographically smaller lang must win, stably
        d = spark.createDataFrame(
            [(0, "aa", "x y"), (1, "bb", "x y"), (2, "aa", "x y"), (3, "bb", "x y")],
            ["doc_id", "lang", "text"],
        )
        preds = {r["doc_id"]: r["pred_lang"] for r in nb_lang_classifier(d).collect()}
        assert set(preds.values()) == {"aa"}
