from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dedupe_trees_spark.operators.similarity import brute_force_topk, lsh_topk


def _embeddings(spark, n=200, dim=16, seed=4):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]), vecs


def _true_topk(vecs, qids, k):
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    out = {}
    for q in qids:
        s = sims[q].copy()
        s[q] = -np.inf
        order = np.argsort(-s, kind="stable")
        out[q] = list(order[:k])
    return out


def test_brute_force_topk_matches_numpy(spark):
    df, vecs = _embeddings(spark)
    q = df.filter(F.col("vec_id") < 5)
    got = brute_force_topk(df, q, k=5).collect()
    truth = _true_topk(vecs.astype(np.float64), range(5), 5)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["vec_id"], r["cos_sim"]))
    for qid in range(5):
        ranked = [v for _, v, _ in sorted(by_q[qid])]
        assert ranked == truth[qid]


def test_lsh_topk_recall_on_planted_neighbors(spark):
    """ANN is for *near* neighbors: plant 3 noisy copies (cos≈0.95) of
    each query vector among random distractors; SRP buckets must find them."""
    rng = np.random.default_rng(8)
    dim, n_q = 16, 10
    bases = rng.standard_normal((n_q, dim)).astype(np.float64)
    rows = []
    truth = {}
    vid = 100
    for qi in range(n_q):
        rows.append((qi, [float(x) for x in bases[qi]]))
        truth[qi] = set()
        for _ in range(3):
            noisy = bases[qi] + 0.18 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in noisy]))
            truth[qi].add(vid)
            vid += 1
    for _ in range(300):  # distractors
        rows.append((vid, [float(x) for x in rng.standard_normal(dim)]))
        vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < n_q)
    got = lsh_topk(df, q, k=3, dim=dim, n_bits=8, n_tables=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(truth[qi] & by_q.get(qi, set())) for qi in range(n_q))
    assert hits / (3 * n_q) >= 0.9
