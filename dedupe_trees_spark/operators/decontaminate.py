"""Benchmark n-gram decontamination for training corpora.

Before training on web text, pipelines remove documents that overlap an
evaluation benchmark: a corpus document is *contaminated* if it shares
at least one n-word-gram (n=13 is the common production choice) with
any benchmark document. Reference parity: dedupe_trees has no
cross-corpus operator (SURVEY.md §2.1); this is part of the mandated
training-data superset (north rule: Common-Crawl-style pages feeding
an LLM data pipeline).

Semantics (oracle-exact, see queries.py twins):

* a *gram* is n consecutive whitespace tokens of the raw text joined
  by a single space; documents with fewer than n tokens contribute NO
  grams (they can be neither contaminated nor contaminating) — unlike
  ``word_shingles``'s short-doc fallback, matching the standard
  13-gram decontamination rule;
* ``contamination_report`` returns one row per corpus document with
  the number of distinct overlapping grams, the number of distinct
  benchmark documents hit, and the contaminated flag;
* ``decontaminate`` keeps exactly the corpus rows whose report says
  clean.

Scale notes (100 TB corpus vs a small benchmark side): the benchmark
gram table is broadcast — eval suites are a few 10^6..10^7 grams, and
``join_on="hash"`` shrinks the broadcast to 8 bytes/gram (xxhash64;
a collision can only *over*-flag, never leak a true overlap, and the
expected false-flag count at 10^7 eval grams x 10^11 corpus grams is
~10^18/2^64 ≈ 0.05 docs — acceptable for a removal filter). The
corpus side is a narrow scan: token split + gram build + explode are
all pipeline-local, the probe join is broadcast (no corpus shuffle),
and the only exchange is the groupBy over MATCHED rows — proportional
to contamination volume, not corpus size. The join-back of per-doc hit
counts onto the corpus is likewise broadcast (hit docs are few), so a
full ``decontaminate`` pass never shuffles the corpus at all.

The gram array is built over a *materialized* token-array column —
capturing the ``split()`` expression directly in the transform lambda
re-evaluates it per element after projection collapse (O(n^2), the
measured 34x trap documented on functions/text.py::token_hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_rows(
    df: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "gram",
    hashed: bool = False,
) -> DataFrame:
    """Distinct (id, gram) rows: all stride-1 n-word-grams of ``text_col``.

    Documents with fewer than ``n`` whitespace tokens emit no rows.
    Per-document dedup happens via ``array_distinct`` BEFORE the explode
    — a ``dropDuplicates([id, gram])`` after it would shuffle the whole
    corpus gram table (~one row per token), the biggest exchange a
    decontamination pass could possibly have; ``array_distinct`` keeps
    it pipeline-local, so the output is distinct per doc with zero
    exchanges.

    ``hashed=True`` emits ``xxhash64`` of the token-array slice instead
    of the joined gram string — no per-gram string is ever built
    (xxhash64 consumes the array directly), which removes the dominant
    allocation of the whole pass (~n×text bytes of gram strings).
    Identity is preserved: tokens cannot contain the separator, so
    slice equality ⇔ joined-string equality; only hash collisions
    differ, and those can only over-flag (module notes).
    """
    toks = F.split(F.col(text_col), " ")
    df = df.select(id_col, toks.alias("_toks"))  # materialize before lambdas
    tcol = F.col("_toks")
    starts = F.when(
        F.size(tcol) >= n,
        F.sequence(F.lit(1), F.size(tcol) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    if hashed:
        build = lambda i: F.xxhash64(F.slice(tcol, i, n))  # noqa: E731
    else:
        build = lambda i: F.concat_ws(" ", F.slice(tcol, i, n))  # noqa: E731
    grams = F.array_distinct(F.transform(starts, build))
    return df.select(id_col, F.explode(grams).alias(out_col))


def _check_join_on(join_on: str) -> bool:
    if join_on not in ("gram", "hash"):
        raise ValueError(f"join_on must be 'gram' or 'hash', got {join_on!r}")
    return join_on == "hash"


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    join_on: str = "gram",
) -> DataFrame:
    """Per corpus-document overlap report vs a benchmark table.

    Returns one row per corpus row: (id_col, n_hit_grams, n_eval_docs,
    contaminated). ``join_on="hash"`` probes on xxhash64(gram) instead
    of the gram string (8-byte broadcast entries; see module notes).
    """
    eid = eval_id_col or id_col
    hashed = _check_join_on(join_on)
    ev = ngram_rows(eval_df, n, text_col, eid, hashed=hashed).withColumnRenamed(
        eid, "_ev_id"
    )
    cg = ngram_rows(corpus, n, text_col, id_col, hashed=hashed)
    hits = (
        cg.join(F.broadcast(ev), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_hit_grams"),
            F.countDistinct("_ev_id").alias("n_eval_docs"),
        )
    )
    return (
        corpus.select(id_col)
        .join(F.broadcast(hits), id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            F.coalesce("n_eval_docs", F.lit(0)).alias("n_eval_docs"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    join_on: str = "gram",
) -> DataFrame:
    """Corpus rows with zero n-gram overlap against ``eval_df``.

    Anti-join on the (small, broadcast) contaminated-id set: the corpus
    is scanned once and never shuffled.
    """
    eid = eval_id_col or id_col
    hashed = _check_join_on(join_on)
    ev = (
        ngram_rows(eval_df, n, text_col, eid, hashed=hashed)
        .select("gram")
        .distinct()
    )
    dirty = (
        ngram_rows(corpus, n, text_col, id_col, hashed=hashed)
        .join(F.broadcast(ev), "gram")
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")


def top_ngrams(
    df: DataFrame,
    n: int = 5,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Boilerplate mining: the ``k`` n-word-grams present in the most
    documents, with their document frequencies.

    Rides :func:`ngram_rows` (per-doc-distinct grams, zero exchanges on
    the build), so one partial-aggregated count per gram is the ONLY
    exchange; the top-k itself runs as TakeOrderedAndProject (per-
    partition heaps + a driver merge of k rows, never a full sort).
    Ties order by gram string, so the cut is total and deterministic —
    an engine-portable contract (the DuckDB twin runs the same ORDER
    BY). The mined list feeds a boilerplate strip (e.g. as a
    `paragraphs.py` blocklist) or a crawl-health report; at 10^12 docs
    the gram table is the same volume the decontamination pass already
    handles.
    """
    rows = ngram_rows(df, n, text_col=text_col, id_col=id_col)
    counts = rows.groupBy("gram").agg(F.count(F.lit(1)).alias("doc_freq"))
    return (
        counts.filter(F.col("doc_freq") >= min_df)
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(k)
    )
