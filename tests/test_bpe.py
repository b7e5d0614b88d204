"""BPE token counting (functions/bpe.py): reference-loop semantics,
merge-table validity, engine parity (pandas UDF vs pure Python vs the
DuckDB recursive-CTE oracle), and the pack_shards/temperature seams.

Reference parity note: the reference engine has no tokenizer ([U] —
SURVEY.md §2.1 stops at duplicate resolution); BPE budgets belong to
the mandated training-pipeline superset (round-4 verdict gap #5).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_trees_spark.functions import bpe


def priority_encode(word: str, merges) -> list[str]:
    """Independent formulation: a true priority loop that re-derives
    the best pair from scratch each step and merges ONE occurrence at a
    time (leftmost). Under a valid merge table this must agree with the
    rank-order exhaustive-replace loop in bpe.encode."""
    ranks = {p: i for i, p in enumerate(merges)}
    toks = list(word)
    while True:
        best_rank, best_i = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            return toks
        a, b = merges[best_rank]
        toks[best_i : best_i + 2] = [a + b]


WORD_ALPHABET = "theandingrstoklmw019.-/!"


class TestMergeTable:
    def test_shipped_table_is_valid(self):
        bpe.validate_merges(bpe.MERGES)  # raises on violation

    def test_invalid_ordering_rejected(self):
        with pytest.raises(ValueError, match="not formed"):
            bpe.validate_merges([("a", "tion"), ("t", "h")])

    def test_sql_values_rejects_quotes(self):
        with pytest.raises(ValueError, match="quote-free"):
            bpe.merges_sql_values([("'", "a")])

    def test_load_merges_roundtrip(self, tmp_path):
        p = tmp_path / "merges.txt"
        p.write_text(
            "#version: demo\n"
            + "\n".join(f"{a} {b}" for a, b in bpe.MERGES)
            + "\n"
        )
        assert bpe.load_merges(str(p)) == bpe.MERGES


class TestEncodeSemantics:
    def test_known_words(self):
        assert bpe.encode("the") == ["the"]
        assert bpe.encode("thinker") == ["th", "in", "k", "er"]
        assert bpe.encode("2020") == ["20", "20"]
        assert bpe.encode("....") == ["..", ".."]
        assert bpe.encode("x") == ["x"]

    def test_encode_concat_invariant(self):
        for w in ["internationalization", "aaaa", "ababab", "199999", "//a//"]:
            assert "".join(bpe.encode(w)) == w

    @given(st.text(alphabet=WORD_ALPHABET, min_size=1, max_size=24))
    @settings(max_examples=300, deadline=None)
    def test_rank_order_equals_priority_loop(self, word):
        # the invariant validate_merges guards: exhaustive replace in
        # rank order == one-at-a-time priority merging
        assert bpe.encode(word) == priority_encode(word, bpe.MERGES)

    @given(st.text(alphabet=WORD_ALPHABET + " \t\n", max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_count_text_decomposition(self, text):
        # count = sum over pre-tokens; ws runs contribute exactly 1
        import re

        toks = re.findall(bpe.PRETOKEN_RE, text)
        assert "".join(toks) == text  # pre-tokenizer is a partition
        expect = sum(
            1 if t[0] in " \t\n\r" else len(bpe.encode(t)) for t in toks
        )
        assert bpe.count_text(text) == expect

    def test_null_and_empty(self):
        assert bpe.count_text("") == 0
        assert bpe.count_text(None) == 0


class TestDuckDBOracleParity:
    def test_cte_matches_python_on_fixture(self):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "'/root/testdata/sf0.001/documents.parquet'"
        )
        sql = f"""
        WITH RECURSIVE {bpe.bpe_count_sql_ctes()},
        per AS (
          SELECT p.doc_id,
                 CASE WHEN regexp_matches(p.tok, '^[ \t\n\r]+$') THEN 1
                      ELSE w.bpe_n END AS c
          FROM pretok p LEFT JOIN wcount w ON p.tok = w.w
        )
        SELECT d.doc_id, CAST(COALESCE(s.n, 0) AS BIGINT)
        FROM documents d
        LEFT JOIN (SELECT doc_id, sum(c) AS n FROM per GROUP BY doc_id) s
          ON d.doc_id = s.doc_id
        """
        duck = dict(con.execute(sql).fetchall())
        cache: dict[str, int] = {}
        for did, text in con.execute(
            "SELECT doc_id, text FROM documents"
        ).fetchall():
            assert bpe.count_text(text, _cache=cache) == duck[did], did


class TestSparkParity:
    def test_udf_matches_python(self, spark):
        rows = [
            (0, "the thinker thinks internationalization"),
            (1, "id=2020.... //path// 199999"),
            (2, ""),
            (3, None),
            (4, "a\tb\nc   d"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id", bpe.bpe_token_count("text").alias("n")
            ).collect()
        }
        for did, text in rows:
            assert got[did] == bpe.count_text(text), (did, text)

    def test_pack_shards_bpe_token_col(self, spark):
        from dedupe_trees_spark.operators.shards import pack_shards

        df = spark.createDataFrame(
            [(i, "word " * (i + 1)) for i in range(40)], ["doc_id", "text"]
        ).select("doc_id", bpe.bpe_token_count("text").alias("bt"))
        out = pack_shards(df, target_tokens=30, token_col="bt").collect()
        rows = sorted(out, key=lambda r: r["doc_id"])
        run = 0
        for r in rows:
            assert r["cum_before"] == run
            assert r["shard_id"] == run // 30
            run += r["n_tokens"]

    def test_temperature_weighted_mass(self, spark):
        from dedupe_trees_spark.operators.domains import temperature_resample

        # stratum A: few docs but huge token mass; stratum B: many tiny
        # docs. Doc-count mass keeps all of A; token mass flips it.
        rows = [(i, "A", 1000) for i in range(4)] + [
            (100 + i, "B", 1) for i in range(16)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "w"])
        by_docs = temperature_resample(df, key_col="doc_id")
        by_toks = temperature_resample(df, key_col="doc_id", weight_col="w")
        kept_docs = {r["lang"] for r in by_docs.collect()}
        a_docs = by_docs.filter("lang = 'A'").count()
        a_toks = by_toks.filter("lang = 'A'").count()
        assert a_docs == 4  # A is the rare stratum by doc count: kept whole
        assert a_toks < 4 or by_toks.filter("lang = 'B'").count() == 16
        assert kept_docs == {"A", "B"}
