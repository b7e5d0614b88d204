from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dedupe_trees_spark.datagen import GenConfig, generate_pages
from dedupe_trees_spark.functions.minhash import _perm_params, minhash_batch, minhash_udf
from dedupe_trees_spark.functions.text import shingle_hashes
from dedupe_trees_spark.operators.lsh import (
    candidate_pairs,
    candidate_pairs_hashagg,
    explode_bands,
    minhash_lsh_pairs,
    verify_pairs,
)


def test_minhash_batch_deterministic_and_jaccard_estimate():
    a, b = _perm_params(256, seed=42)
    rng = np.random.default_rng(0)
    base = rng.integers(-(2**62), 2**62, size=200, dtype=np.int64)
    # two sets with known overlap 150/250 = J = 150/250
    s1 = base
    s2 = np.concatenate([base[:150], rng.integers(-(2**62), 2**62, size=50, dtype=np.int64)])
    union = len(np.union1d(s1, s2))
    inter = len(np.intersect1d(s1, s2))
    j_true = inter / union
    sigs = minhash_batch(pd.Series([s1, s2, s1]), a, b)
    est = float(np.mean(np.array(sigs[0]) == np.array(sigs[1])))
    assert abs(est - j_true) < 0.12
    assert np.array_equal(np.array(sigs[0]), np.array(sigs[2]))  # identical set → identical sig


def test_minhash_batch_empty_and_single():
    a, b = _perm_params(16, seed=1)
    sigs = minhash_batch(pd.Series([np.array([], dtype=np.int64), np.array([5], dtype=np.int64)]), a, b)
    assert len(sigs[0]) == 16 and len(sigs[1]) == 16


def test_minhash_udf_matches_local(spark):
    texts = [("u1", "a b c d e f g h"), ("u2", "a b c d e f g h"), ("u3", "z y x w v u t s")]
    df = spark.createDataFrame(texts, ["url", "text"]).withColumn(
        "shingles", shingle_hashes("text", k=3)
    )
    out = df.withColumn("sig", minhash_udf(64, seed=9)(F.col("shingles"))).collect()
    sigs = {r["url"]: r["sig"] for r in out}
    assert sigs["u1"] == sigs["u2"]
    assert sigs["u1"] != sigs["u3"]
    assert len(sigs["u1"]) == 64


def test_explode_bands_shape(spark):
    df = spark.createDataFrame([("u1", list(range(128)))], ["url", "minhash"])
    bands = explode_bands(df, bands=32, rows=4).collect()
    assert len(bands) == 32
    assert sorted(r["band_id"] for r in bands) == list(range(32))


def test_candidate_pairs_cold_bucket(spark):
    rows = [("u1", 0, 11), ("u2", 0, 11), ("u3", 0, 11), ("u4", 0, 99)]
    bands = spark.createDataFrame(rows, ["url", "band_id", "band_hash"])
    pairs = sorted((r["url_a"], r["url_b"]) for r in candidate_pairs(bands).collect())
    assert pairs == [("u1", "u2"), ("u1", "u3"), ("u2", "u3")]


def test_candidate_pairs_hot_bucket_stays_connected(spark):
    # one bucket with 40 members, cap=8 → salted; graph must stay connected
    rows = [(f"u{i:02d}", 0, 7) for i in range(40)]
    bands = spark.createDataFrame(rows, ["url", "band_id", "band_hash"])
    pairs = [(r["url_a"], r["url_b"]) for r in candidate_pairs(bands, cap=8).collect()]
    # far fewer than the 780 full pairs
    assert 39 <= len(pairs) < 400
    # connectivity check via union-find
    parent = {f"u{i:02d}": f"u{i:02d}" for i in range(40)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(x) for x in parent}) == 1


def test_candidate_pairs_hashagg_value_identical(spark):
    """The sort-free hash-agg candidate pass must emit EXACTLY the
    window build's pair set — topology (cold all-pairs, hot salted
    star, star-src cold star) and srcs bits included — across every
    bucket regime in one fixture:

    - bucket A: cold (3 members ≤ cap=8), src=1 → all-pairs
    - bucket B: hot (40 members > cap=8), src=1 → salted star
    - bucket C: cold, src=8 with star_srcs=8 → single star
    - bucket D: hot, src=8 with star_srcs=8 → salted star
    - bucket E: singleton → no pairs
    plus the same fixture WITHOUT the src column (dropDuplicates path).
    """
    rows = (
        [(f"a{i}", 0, 11, 1) for i in range(3)]
        + [(f"b{i:02d}", 1, 22, 1) for i in range(40)]
        + [(f"c{i}", 2, 33, 8) for i in range(5)]
        + [(f"d{i:02d}", 3, 44, 8) for i in range(40)]
        + [("e0", 4, 55, 1)]
    )
    bands = spark.createDataFrame(rows, ["url", "band_id", "band_hash", "src"])

    def norm(df):
        return sorted(map(tuple, df.collect()))

    win = norm(candidate_pairs(bands, cap=8, star_srcs=8))
    hag = norm(candidate_pairs_hashagg(bands, cap=8, star_srcs=8))
    assert hag == win
    assert len(win) > 40  # fixture actually exercises hot buckets

    nosrc = bands.drop("src")
    assert norm(candidate_pairs_hashagg(nosrc, cap=8)) == norm(
        candidate_pairs(nosrc, cap=8)
    )


def test_candidate_pairs_hashagg_pipeline_identity(spark, tmp_path):
    """End-to-end: --hashagg-candidates produces the byte-identical
    canonical table on a generated corpus with planted duplicates."""
    from dedupe_trees_spark.config import PipelineConfig
    from dedupe_trees_spark.datagen import generate_pages
    from dedupe_trees_spark.io import read_stage
    from dedupe_trees_spark.plans.pipeline import DedupePipeline

    inp = str(tmp_path / "pages")
    generate_pages(spark, GenConfig(n_docs=1500, seed=7), partitions=8).write.mode(
        "overwrite"
    ).parquet(inp)

    outs = {}
    for label, flag in (("window", False), ("hashagg", True)):
        ck = str(tmp_path / f"ck_{label}")
        cfg = PipelineConfig(
            input_path=inp, ckpt_dir=ck, bucket_cap=64, hashagg_candidates=flag
        )
        DedupePipeline(spark, cfg).run()
        outs[label] = sorted(
            map(
                tuple,
                read_stage(spark, ck, "canonical")
                .select("url", "component_id", "rank", "is_canonical")
                .collect(),
            )
        )
        assert (
            spark.conf.get(
                "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
                "128",
            )
            == "128"
        ), "tuned fallback threshold leaked past the pairs stage"
    assert outs["hashagg"] == outs["window"]
    assert len(outs["window"]) > 1400  # re-crawl url collapse may drop a few


def test_verify_pairs_filters_false_positives(spark):
    sigs = spark.createDataFrame(
        [
            ("u1", [1, 2, 3, 4, 5]),
            ("u2", [1, 2, 3, 4, 6]),   # J = 4/6 = 0.667
            ("u3", [9, 10, 11, 12, 13]),  # J with u1 = 0
        ],
        ["url", "shingles"],
    )
    cands = spark.createDataFrame([("u1", "u2"), ("u1", "u3")], ["url_a", "url_b"])
    out = verify_pairs(cands, sigs, threshold=0.6).collect()
    assert [(r["url_a"], r["url_b"]) for r in out] == [("u1", "u2")]
    assert abs(out[0]["score"] - 4 / 6) < 1e-9
    assert out[0]["kind"] == "minhash"
    out2 = verify_pairs(cands, sigs, threshold=0.7).collect()
    assert out2 == []


def _brute_force_pairs(pdf, k=3, threshold=0.8):
    def sh(t):
        x = t.split()
        return set(tuple(x[i : i + k]) for i in range(max(len(x) - k + 1, 1)))

    S = {r.url: sh(r.text) for r in pdf.itertuples()}
    urls = sorted(S)
    truth = set()
    for a, b in itertools.combinations(urls, 2):
        inter = len(S[a] & S[b])
        if inter == 0:
            continue
        j = inter / (len(S[a]) + len(S[b]) - inter)
        if j >= threshold:
            truth.add((a, b))
    return truth


def test_lsh_recall_on_synthetic_pages(spark):
    """SURVEY §5.3 recall harness: pipeline pairs vs brute-force exact
    Jaccard at the same shingle/signature config; target recall ≥ 0.99."""
    cfg = GenConfig(n_docs=1500, seed=42)
    pages = generate_pages(spark, cfg, partitions=8).select("url", "text")
    sigs = pages.withColumn("shingles", shingle_hashes("text", k=3))
    from dedupe_trees_spark.operators.lsh import add_signature

    sigs = add_signature(sigs, num_perm=128, seed=42)
    got = {
        (r["url_a"], r["url_b"])
        for r in minhash_lsh_pairs(
            sigs, bands=32, rows=4, cap=64, threshold=0.8
        ).collect()
    }
    truth = _brute_force_pairs(pages.toPandas(), k=3, threshold=0.8)
    assert truth, "fixture must contain planted near-dup pairs"
    missed = truth - got
    recall = 1 - len(missed) / len(truth)
    assert recall >= 0.99, f"recall {recall} missed {list(missed)[:5]}"
    # precision is exact by construction (verified pairs only)
    false_pos = got - truth
    assert not false_pos, f"verified pairs must be a subset of truth: {list(false_pos)[:5]}"


def test_gram_mix_determinism_and_shift_sensitivity():
    import numpy as np
    from dedupe_trees_spark.functions.minhash import gram_mix

    rng = np.random.default_rng(2)
    th = rng.integers(-(2**62), 2**62, size=50, dtype=np.int64)
    a = gram_mix(th, 3)
    b = gram_mix(th, 3)
    assert np.array_equal(a, b)
    assert len(a) == 48
    # same tokens shifted by one → 47 shared gram values
    shifted = gram_mix(th[1:], 3)
    assert len(np.intersect1d(a, shifted)) == 47
    # short docs: single gram
    assert len(gram_mix(th[:2], 3)) == 1
    assert len(gram_mix(th[:0], 3)) == 0
    # order matters
    rev = gram_mix(th[::-1].copy(), 3)
    assert len(np.intersect1d(a, rev)) == 0


def test_minhash_kernel_blocked_matches_naive():
    """The r06 cache-blocked permutation loop must be bit-identical to
    the naive one-pass-per-perm formulation on ragged batches covering
    empty docs, single-element docs, and docs larger than the 64k-element
    block target."""
    a, b = _perm_params(128, seed=42)
    rng = np.random.default_rng(7)
    docs = [
        np.array([], dtype=np.int64),
        np.array([5], dtype=np.int64),
        rng.integers(-(2**62), 2**62, size=300, dtype=np.int64),
        np.array([], dtype=np.int64),
        rng.integers(-(2**62), 2**62, size=70_000, dtype=np.int64),  # > one block
        rng.integers(-(2**62), 2**62, size=17, dtype=np.int64),
    ]
    got = minhash_batch(pd.Series(docs), a, b)

    # naive reference (the pre-r06 formulation, inlined)
    _EMPTY = np.uint64(0x9E3779B97F4A7C15)
    for i, arr in enumerate(docs):
        seg = arr.view(np.uint64) if len(arr) else np.array([_EMPTY], dtype=np.uint64)
        want = np.empty(len(a), dtype=np.int32)
        for p in range(len(a)):
            want[p] = np.int32(((a[p] * seg + b[p]) >> np.uint64(33)).min())
        assert np.array_equal(np.asarray(got[i], dtype=np.int32), want), f"doc {i}"
