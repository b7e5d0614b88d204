"""Exact-substring duplicate detection (SURVEY.md §2.2 M4).

Finds pairs of documents sharing a verbatim character run of at least
``guarantee`` characters — the dedupe-trees generalization used for
training corpora where one page embeds a long quote of another.

Two physical strategies, one logical semantic:

1. ``substring_pairs_exact`` — stride-1 k-char grams on both sides,
   equi-join on the gram hash. Fully relational (JVM codegen end to
   end), zero false negatives for shared runs ≥ k. O(total_chars) gram
   rows — the choice for oracle checks and moderate corpora.

2. ``substring_pairs_winnow`` — winnowing (Schleimer, Wilkerson, Aiken,
   SIGMOD'03 — the MOSS fingerprinting scheme): per document keep only
   the minimum gram hash in every window of ``w`` consecutive k-grams
   (rightmost-min tie-break), a deterministic ~2/(w+1) sample that still
   GUARANTEES detection of any shared run of ≥ k + w − 1 chars. The
   sliding-window min runs in NumPy inside a pandas UDF over the
   JVM-computed gram-hash arrays. This is the 100-TB path: fingerprint
   volume shrinks ~w× before the shuffle/join.

Both emit candidate gram-bucket pairs capped/salted like LSH buckets
(a boilerplate legal header shared by millions of pages is exactly a
hot bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedupe_trees_spark.functions.text import char_ngrams
from dedupe_trees_spark.operators.lsh import candidate_pairs


def gram_hashes(col, k: int) -> F.Column:
    """Stride-1 k-char gram hashes → array<bigint> (JVM-side)."""
    return F.transform(char_ngrams(col, k=k, stride=1), lambda s: F.xxhash64(s))


def _winnow_batch(arrays: pd.Series, w: int) -> pd.Series:
    """Per doc: distinct hashes selected as window-minima (winnowing)."""
    out = []
    for arr in arrays:
        h = np.asarray(arr, dtype=np.int64)
        n = len(h)
        if n == 0:
            out.append(np.empty(0, dtype=np.int64))
            continue
        if n <= w:
            out.append(np.unique(h[h == h.min()][:1]))
            continue
        # sliding-window min via stride tricks: windows (n-w+1, w)
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        mins = win.min(axis=1)
        out.append(np.unique(mins))
    return pd.Series(out)


def winnow_udf(w: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _winnow(arrays: pd.Series) -> pd.Series:
        return _winnow_batch(arrays, w)

    return _winnow


def _pairs_from_gram_sets(
    df: DataFrame, grams_col, id_col: str, cap: int
) -> DataFrame:
    """(id, array<gram_hash>) → distinct candidate pairs via bucket join."""
    buckets = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams_col)).alias("band_hash"),
    ).withColumn("band_id", F.lit(0))
    return candidate_pairs(buckets, id_col=id_col, cap=cap)


def substring_pairs_exact(
    df: DataFrame, id_col: str = "url", text_col: str = "text", k: int = 64, cap: int = 256
) -> DataFrame:
    """Pairs sharing ≥1 exact k-char substring (stride-1 both sides)."""
    return _pairs_from_gram_sets(df, gram_hashes(text_col, k), id_col, cap)


def substring_pairs_winnow(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    k: int = 48,
    w: int = 17,
    cap: int = 256,
) -> DataFrame:
    """Pairs sharing a run of ≥ k+w−1 chars — winnowed fingerprints.

    Guarantee: any common substring of length ≥ k+w−1 contains a full
    window of w k-grams on both sides; both documents select the same
    minimal gram hash from it, so the pair lands in one bucket.
    """
    grams = df.select(F.col(id_col), gram_hashes(text_col, k).alias("_grams"))
    fps = grams.withColumn("_fp", winnow_udf(w)(F.col("_grams")))
    return _pairs_from_gram_sets(fps, F.col("_fp"), id_col, cap)
