"""Paragraph-level exact deduplication (CCNet-style) for web text.

Training-data pipelines remove *repeated paragraphs* across a corpus
(boilerplate navigation, cookie banners, license blurbs) while keeping
each document's unique prose — the paragraph-granularity sibling of the
whole-document exact dedup in ``operators/exact.py``. Reference parity:
dedupe_trees has no sub-document operator (SURVEY.md §2.1); this is
part of the mandated superset (north rule: Common-Crawl-style pages).

Semantics (oracle-exact, see queries.py twins):

* a *paragraph* is one element of the document split on a separator
  (``explode_paragraphs``, default ``"\\n\\n"``) — or, for corpora
  without newlines (the driver fixture), a fixed-size token chunk
  (``token_chunk_paragraphs``);
* the corpus-wide keeper of each distinct paragraph is its first
  occurrence in ``(doc_id, pos)`` order; every other occurrence —
  including repeats inside the same document — is dropped;
* ``paragraph_dedup`` rebuilds each document from its kept paragraphs
  in original order (empty string if nothing survives), preserving one
  output row per input document.

Scale notes (100 TB): the keeper table is built with a groupBy on the
paragraph hash + a join-back, NOT a count/row_number window — a window
would funnel every occurrence of a hot boilerplate paragraph (easily
10^7 rows for one cookie banner) into a single task before discarding
them, while the groupBy gets map-side partial aggregation so hot keys
collapse before the exchange (same adjudication as the n-gram DF cap in
queries.py). Two exchanges total: keeper-hash agg and the per-doc
reassembly groupBy. Everything is JVM-side codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(
    df: DataFrame, text_col: str = "text", sep: str = "\n\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per non-empty paragraph: (id, pos, para)."""
    return (
        df.select(id_col, F.posexplode(F.split(F.col(text_col), sep)))
        .withColumnRenamed("col", "para")
        .filter(F.col("para") != "")
    )


def token_chunk_paragraphs(
    df: DataFrame, text_col: str = "text", chunk: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token chunks as pseudo-paragraphs: (id, pos, para).

    For single-line corpora (the driver fixture documents) the span
    unit is a run of ``chunk`` whitespace tokens; the last chunk may be
    shorter. Deterministic and oracle-exact vs DuckDB list slicing.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.array_join(F.slice(toks, i * chunk + 1, chunk), " ").alias("para"),
        ),
    )
    return (
        df.select(id_col, F.explode(spans).alias("p"))
        .select(id_col, F.col("p.pos").alias("pos"), F.col("p.para").alias("para"))
    )


def paragraph_dup_stats(paras: DataFrame) -> DataFrame:
    """Corpus-wide duplicated paragraphs: (para, n_docs, n_occ ≥ 2).

    Map-side partial agg collapses hot boilerplate before the shuffle.
    """
    return (
        paras.groupBy("para")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_occ") >= 2)
    )


def keep_first_occurrences(paras: DataFrame) -> DataFrame:
    """Rows of ``paras`` surviving global first-occurrence dedup.

    Keeper per distinct paragraph = min (doc_id, pos). groupBy on the
    64-bit paragraph hash + join-back (skew-safe; see module doc). The
    join-back compares the paragraph STRING, so a hash collision can
    only drop an extra occurrence pair that collided — at 10^12 docs
    use the same 128-bit escape hatch as node ids if paranoid.
    """
    h = F.xxhash64("para")
    keepers = (
        paras.select(h.alias("ph"), F.struct("doc_id", "pos").alias("occ"))
        .groupBy("ph")
        .agg(F.min("occ").alias("keep"))
    )
    return (
        paras.join(keepers, h == F.col("ph"))
        .filter(
            (F.col("doc_id") == F.col("keep.doc_id"))
            & (F.col("pos") == F.col("keep.pos"))
        )
        .select("doc_id", "pos", "para")
    )


def paragraph_dedup(
    docs: DataFrame, paras: DataFrame, sep: str = "\n\n",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each doc from its kept paragraphs: (doc_id, clean_text).

    One row per input document; documents whose every paragraph was
    seen earlier elsewhere come back as the empty string (downstream
    length filters then drop them — same flow as CCNet).
    """
    kept = keep_first_occurrences(paras)
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean_text")
    )
    return docs.select(id_col).join(rebuilt, id_col, "left").select(
        id_col, F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )


def preclean_paragraphs(
    pages: DataFrame, text_col: str = "text", sep: str = "\n\n"
) -> DataFrame:
    """Corpus-wide paragraph dedup applied to a pages relation: the
    CCNet composition — strip repeated boilerplate FIRST, so the
    document-level near-dup pass downstream clusters on prose, not on
    shared navigation/banner text. Returns ``pages`` with ``text_col``
    replaced by the cleaned text (row count and all other columns
    preserved; a pure-boilerplate page comes back with empty text and
    falls to the usual length filters).

    Row identity is a deterministic content key (xxhash64 over
    url [+ warc_ts] + text), NOT the url: multi-crawl tables carry the
    same url several times (the re-crawl rows S1's audit later
    collapses), and keying on url would merge different crawls'
    paragraph lists into one garbled document. Byte-identical re-crawl
    rows share a key; exactly one representative is cleaned and the
    join fans the result back to every copy.
    """
    key_cols = ["url"] + (["warc_ts"] if "warc_ts" in pages.columns else [])
    staged = pages.withColumn("_pid", F.xxhash64(*key_cols, text_col))
    docs = (
        staged.select(F.col("_pid").alias("doc_id"), text_col)
        .dropDuplicates(["doc_id"])
    )
    paras = explode_paragraphs(docs, text_col, sep)
    clean = paragraph_dedup(docs, paras, sep).withColumnRenamed("doc_id", "_pid")
    return (
        staged.drop(text_col)
        .join(clean, "_pid")
        .withColumnRenamed("clean_text", text_col)
        .drop("_pid")
    )
