"""SimHash (64-bit) as a vectorized Arrow/pandas UDF.

Like MinHash, the Python side only sees the JVM-computed token/shingle
hash arrays (int64): the bit-vote is pure NumPy — unpack each hash into
±1 bit votes, sum per document, sign → packed uint64 fingerprint.

Candidate generation uses the pigeonhole principle (SURVEY.md §2.2):
split the 64-bit fingerprint into 4 chunks of 16 bits; any pair within
Hamming distance ≤ 3 must agree on at least one chunk, so an equi-join
per chunk finds all such pairs, then an exact popcount(xor) filter
(and, in the pipeline, exact-Jaccard verification) removes the rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simhash_batch(arrays: pd.Series) -> pd.Series:
    n = len(arrays)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    lens = arrays.map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(out)
    flat = np.empty(total, dtype=np.uint64)
    pos = 0
    for arr in arrays:
        m = len(arr)
        if m:
            flat[pos : pos + m] = np.asarray(arr, dtype=np.int64).view(np.uint64)
            pos += m
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    nonempty = lens > 0
    # reduceat segment starts must be < total; empty docs are zeroed after
    idx = np.minimum(offsets, total - 1)
    packed = np.zeros(n, dtype=np.uint64)
    half = lens.astype(np.float64) / 2.0
    # per-bit pass keeps peak memory at O(total), not O(total × 64)
    for j in range(64):
        bitcol = ((flat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bitcol, idx)
        packed |= ((ones > half).astype(np.uint64)) << np.uint64(j)
    packed[~nonempty] = 0
    return pd.Series(packed.view(np.int64))


@F.pandas_udf(T.LongType())
def simhash_udf(arrays: pd.Series) -> pd.Series:
    return simhash_batch(arrays)


def simhash_chunks(col: Column | str, n_chunks: int = 4) -> Column:
    """64-bit simhash → array of (chunk_id << 16 | 16-bit chunk value).

    Packing the chunk index into the value keeps the later equi-join a
    single-column join on a long.
    """
    c = F.col(col) if isinstance(col, str) else col
    width = 64 // n_chunks
    mask = (1 << width) - 1
    # unrolled in Python: shift amounts must be literals, and n_chunks is
    # a compile-time constant anyway
    return F.array(
        *[
            F.lit((i + 1) << 48)
            + F.shiftrightunsigned(c, i * width).bitwiseAND(F.lit(mask))
            for i in range(n_chunks)
        ]
    )


def hamming_dist(a: Column, b: Column) -> Column:
    """Popcount of xor — exact Hamming distance between two int64s."""
    return F.bit_count(a.bitwiseXOR(b))
