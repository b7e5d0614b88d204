from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dedupe_trees_spark.functions.simhash import simhash_batch
from dedupe_trees_spark.functions.text import shingle_hashes
from dedupe_trees_spark.operators.simhash_join import add_simhash, simhash_pairs


def _ham(a, b) -> int:
    return bin((int(a) ^ int(b)) & (2**64 - 1)).count("1")


def test_simhash_batch_identical_and_similar():
    rng = np.random.default_rng(3)
    base = rng.integers(-(2**62), 2**62, size=300, dtype=np.int64)
    similar = base.copy()
    similar[:10] = rng.integers(-(2**62), 2**62, size=10, dtype=np.int64)
    different = rng.integers(-(2**62), 2**62, size=300, dtype=np.int64)
    sigs = simhash_batch(pd.Series([base, base, similar, different]))
    assert sigs[0] == sigs[1]
    assert _ham(sigs[0], sigs[2]) <= 8          # ~3% token change → few bits
    assert _ham(sigs[0], sigs[3]) > 16          # unrelated → ~32 bits


def test_simhash_batch_empty():
    sigs = simhash_batch(pd.Series([np.array([], dtype=np.int64)]))
    assert sigs[0] == 0


def test_simhash_pairs_end_to_end(spark):
    texts = [
        ("u1", "the quick brown fox jumps over the lazy dog " * 8),
        ("u2", "the quick brown fox jumps over the lazy dog " * 8),  # identical
        ("u3", "completely different content about spark engines and shuffles " * 8),
    ]
    df = spark.createDataFrame(texts, ["url", "text"]).withColumn(
        "shingles", shingle_hashes("text", k=3)
    )
    df = add_simhash(df)
    pairs = [(r["url_a"], r["url_b"], r["hamming"]) for r in simhash_pairs(df).collect()]
    assert ("u1", "u2", 0) in pairs
    assert all({a, b} != {"u1", "u3"} for a, b, _ in pairs)


def test_simhash_near_duplicate_detected(spark):
    # non-repetitive text (big distinct shingle set); one token changed out
    # of 300 flips at most 3 shingles → tiny Hamming distance, pigeonhole
    # guarantees the candidate join finds it
    rng = np.random.default_rng(11)
    toks = [f"tok{i}x{int(v)}" for i, v in enumerate(rng.integers(0, 1000, size=300))]
    base = " ".join(toks)
    toks2 = list(toks)
    toks2[150] = "changed"
    near = " ".join(toks2)
    df = spark.createDataFrame(
        [("a", base), ("b", near)], ["url", "text"]
    ).withColumn("shingles", shingle_hashes("text", k=3))
    df = add_simhash(df)
    out = simhash_pairs(df, max_hamming=3).collect()
    assert len(out) == 1
    assert out[0]["hamming"] <= 3
