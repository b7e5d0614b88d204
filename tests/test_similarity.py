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


def test_neardup_pairs_planted_twins_production_params(spark):
    """Dedup-family embedding near-dup at the production operating point
    (tau=0.9, b=16 bits): plant noisy twins (cos ≈ 0.97) among random
    distractors; demand (a) recall 1.0 on planted twin pairs, (b) zero
    emitted pair below tau (the verify is exact, so this must be exact),
    (c) no duplicate or self pairs, id_a < id_b."""
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    rng = np.random.default_rng(21)
    dim, n_base = 32, 40
    rows, truth = [], set()
    vid = 0
    for _ in range(n_base):
        base = rng.standard_normal(dim)
        a, b = vid, vid + 1
        noisy = base + 0.12 * rng.standard_normal(dim)
        rows.append((a, [float(x) for x in base]))
        rows.append((b, [float(x) for x in noisy]))
        truth.add((a, b))
        vid += 2
    for _ in range(400):
        rows.append((vid, [float(x) for x in rng.standard_normal(dim)]))
        vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = neardup_pairs(
        df, tau=0.9, dim=dim, n_bits=16, n_tables=8, seed=7
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert len(pairs) == len(got)  # no dup rows
    assert all(a < b for a, b in pairs)
    assert all(r["cos_sim"] >= 0.9 for r in got)
    # every planted twin pair whose true cosine clears tau must be found
    vecs = {i: np.array(v, dtype=np.float64) for i, v in rows}
    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
    qualifying = {(a, b) for a, b in truth if cos(a, b) >= 0.9}
    assert len(qualifying) >= 30  # the plant actually produced twins
    assert qualifying <= pairs
    # and nothing below tau sneaks in via the exact verify
    assert all(cos(a, b) >= 0.9 - 1e-9 for a, b in pairs)


def test_neardup_pairs_bucket_cap_drops_hot_bucket(spark):
    """bucket_cap guards the m²/2 blowup: identical vectors all share
    every bucket; with cap below the clone count the operator must emit
    nothing for them (bounded recall loss, hard candidate ceiling)."""
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    rng = np.random.default_rng(5)
    dim = 16
    clone = [float(x) for x in rng.standard_normal(dim)]
    rows = [(i, clone) for i in range(50)]
    rows += [(100 + i, [float(x) for x in rng.standard_normal(dim)]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = neardup_pairs(df, tau=0.9, dim=dim, n_bits=8, n_tables=4, bucket_cap=10)
    assert capped.filter((F.col("id_a") < 50) & (F.col("id_b") < 50)).count() == 0
    uncapped = neardup_pairs(df, tau=0.9, dim=dim, n_bits=8, n_tables=4)
    assert uncapped.filter((F.col("id_a") < 50) & (F.col("id_b") < 50)).count() == 50 * 49 // 2


def test_ivf_topk_recall_on_planted_neighbors(spark):
    """IVF-Flat sibling of the SRP recall test: plant 3 noisy copies
    (cos ≈ 0.95) of each query among random distractors; nprobe cells
    must recover them. Also pins determinism: two runs, same result."""
    from dedupe_trees_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(8)
    dim, n_q = 16, 10
    bases = rng.standard_normal((n_q, dim)).astype(np.float64)
    rows, truth = [], {}
    vid = 100
    for qi in range(n_q):
        rows.append((qi, [float(x) for x in bases[qi]]))
        truth[qi] = set()
        for _ in range(3):
            noisy = bases[qi] + 0.18 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in noisy]))
            truth[qi].add(vid)
            vid += 1
    for _ in range(300):
        rows.append((vid, [float(x) for x in rng.standard_normal(dim)]))
        vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < n_q)
    got = sorted(
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in ivf_topk(df, q, k=3, n_cells=12, nprobe=4).collect()
    )
    by_q = {}
    for qid, vid2, _ in got:
        by_q.setdefault(qid, set()).add(vid2)
    hits = sum(len(truth[qi] & by_q.get(qi, set())) for qi in range(n_q))
    assert hits / (3 * n_q) >= 0.9
    again = sorted(
        (r["query_id"], r["vec_id"], r["rnk"])
        for r in ivf_topk(df, q, k=3, n_cells=12, nprobe=4).collect()
    )
    assert got == again


def test_semantic_dedup_planted_clusters(spark):
    """Two planted semantic clusters + noise: each cluster keeps exactly
    its min-id member, noise docs survive as singletons."""
    import numpy as np

    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    rng = np.random.default_rng(7)
    dim = 16
    rows = []
    for base_id, seed_vec in ((0, rng.standard_normal(dim)),
                              (100, rng.standard_normal(dim))):
        for j in range(4):
            noisy = seed_vec + 0.02 * rng.standard_normal(dim)
            rows.append((base_id + j, [float(x) for x in noisy]))
    for k in range(200, 220):
        rows.append((k, [float(x) for x in rng.standard_normal(dim)]))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = neardup_pairs(e, tau=0.9, dim=dim, n_bits=4, n_tables=32, seed=1)
    comps = assign_components(
        e.select("vec_id"), pairs, id_col="vec_id", a="id_a", b="id_b"
    )
    got = {r["vec_id"]: r["component_id"] for r in comps.collect()}
    assert {got[i] for i in (0, 1, 2, 3)} == {0}
    assert {got[i] for i in (100, 101, 102, 103)} == {100}
    kept = [v for v, c in got.items() if v == c]
    assert set(kept) == {0, 100, *range(200, 220)}


def test_neardup_pairs_star_mode_same_components(spark):
    """Star mode emits O(m) edges per cluster but must yield the SAME
    component structure as all-pairs mode on planted clusters."""
    import numpy as np

    from dedupe_trees_spark.operators.components import assign_components
    from dedupe_trees_spark.operators.similarity import neardup_pairs

    rng = np.random.default_rng(3)
    dim = 16
    rows = []
    for base_id in (0, 100, 200):
        seed_vec = rng.standard_normal(dim)
        for j in range(12):
            noisy = seed_vec + 0.02 * rng.standard_normal(dim)
            rows.append((base_id + j, [float(x) for x in noisy]))
    for k in range(300, 340):
        rows.append((k, [float(x) for x in rng.standard_normal(dim)]))
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def comps(mode):
        p = neardup_pairs(
            e, tau=0.9, dim=dim, n_bits=4, n_tables=32, seed=1, mode=mode
        )
        c = assign_components(
            e.select("vec_id"), p, id_col="vec_id", a="id_a", b="id_b"
        )
        return {r["vec_id"]: r["component_id"] for r in c.collect()}

    all_mode, star_mode = comps("all"), comps("star")
    assert all_mode == star_mode
    n_all = neardup_pairs(
        e, tau=0.9, dim=dim, n_bits=4, n_tables=32, seed=1, mode="all"
    ).count()
    n_star = neardup_pairs(
        e, tau=0.9, dim=dim, n_bits=4, n_tables=32, seed=1, mode="star"
    ).count()
    assert n_star < n_all  # 12-member cliques: 11 star edges vs 66 pairs


def test_neardup_pairs_star_mode_documented_limitation(spark):
    """Negative case pinning the documented star-mode trade-off: when a
    bucket's min-id member is BELOW tau to the others (a bucket that
    mixes a near-orthogonal center with a tight pair), the star edges
    verify-fail and the pair is lost unless another bucket separates
    them — so all-pairs mode must stay the contract for exhaustive
    pair enumeration."""
    import numpy as np

    from dedupe_trees_spark.operators.similarity import neardup_pairs

    dim = 8
    base = np.zeros(dim); base[0] = 1.0
    tight_a = base.copy(); tight_b = base.copy(); tight_b[1] = 0.01
    ortho = np.zeros(dim); ortho[1] = 1.0
    # single table, zero bits -> ONE bucket holding everything: the
    # star centers on min id (the ortho vector), both star edges fail
    # the cosine verify, and the tight pair is unreachable
    rows = [
        (0, [float(x) for x in ortho]),
        (1, [float(x) for x in tight_a]),
        (2, [float(x) for x in tight_b]),
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    star = neardup_pairs(
        e, tau=0.9, dim=dim, n_bits=0, n_tables=1, seed=1, mode="star"
    ).collect()
    full = neardup_pairs(
        e, tau=0.9, dim=dim, n_bits=0, n_tables=1, seed=1, mode="all"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in full] == [(1, 2)]
    assert star == []  # the documented loss case — use mode="all" to enumerate
