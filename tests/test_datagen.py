from __future__ import annotations

import numpy as np

from dedupe_trees_spark.datagen import (
    GenConfig,
    gen_batch,
    generate_pages,
    generate_pages_pandas,
)


def test_deterministic_and_spark_matches_pandas(spark):
    cfg = GenConfig(n_docs=300, seed=7)
    a = generate_pages_pandas(cfg)
    b = generate_pages_pandas(cfg)
    assert a.equals(b)
    sdf = generate_pages(spark, cfg, partitions=5).toPandas()
    sa = a.sort_values("url").reset_index(drop=True)
    sb = sdf.sort_values("url").reset_index(drop=True)
    assert list(sa["url"]) == list(sb["url"])
    assert list(sa["text"]) == list(sb["text"])
    assert list(sa["truth_cluster"]) == list(sb["truth_cluster"])


def test_cluster_kinds_present(spark):
    cfg = GenConfig(n_docs=2000, seed=42)
    df = generate_pages_pandas(cfg)
    kinds = set(df["truth_kind"])
    assert {"unique", "exact", "near", "substr"} <= kinds
    # exact clusters really are byte-identical
    for root, grp in df[df.truth_kind == "exact"].groupby("truth_cluster"):
        assert grp["text"].nunique() == 1
        assert len(grp) >= 2
    # near clusters share most tokens but are not identical
    near = df[(df.truth_kind == "near") & (df.truth_cluster > 0)]
    for root, grp in near.groupby("truth_cluster"):
        texts = list(grp["text"])
        assert len(set(texts)) == len(texts)  # members differ
        t0 = set(texts[0].split())
        for t in texts[1:]:
            inter = len(t0 & set(t.split()))
            assert inter / len(t0) > 0.5


def test_substr_clusters_share_long_span(spark):
    cfg = GenConfig(n_docs=3000, seed=42)
    df = generate_pages_pandas(cfg)
    sub = df[df.truth_kind == "substr"]
    assert len(sub) > 0
    for root, grp in sub.groupby("truth_cluster"):
        root_text = df.loc[df.url == grp.iloc[0]["url"]]  # root is first member
        texts = list(grp.sort_values("url")["text"])
        base = [t for t in texts if len(t) == max(len(x) for x in texts)][0]
        found = 0
        for t in texts:
            if t == base:
                continue
            # some 200-char window of t must appear verbatim in base
            if any(t[i : i + 200] in base for i in range(0, max(1, len(t) - 200), 37)):
                found += 1
        assert found >= len(texts) - 1 or len(texts) == 1


def test_hot_cluster_size(spark):
    cfg = GenConfig(n_docs=4000, seed=42, hot_every=200)
    df = generate_pages_pandas(cfg)
    hot = df[df.truth_cluster == 0]
    assert len(hot) == 20  # 4000/200
    assert hot["lang"].unique().tolist() == ["en"]


def test_html_wraps_text_and_invariant(spark):
    cfg = GenConfig(n_docs=50, seed=1)
    df = generate_pages_pandas(cfg)
    for _, r in df.iterrows():
        assert r["html"] == b"<html><body>" + r["text"].encode() + b"</body></html>"
    assert df["url"].is_unique


def test_copy_pattern_urls_exist(spark):
    cfg = GenConfig(n_docs=5000, seed=42)
    df = generate_pages_pandas(cfg)
    names = df["url"].str.rsplit("/", n=1).str[-1]
    assert names.str.startswith("Copy of ").any()
    assert names.str.contains(r" \(\d+\)\.html$", regex=True).any()


def test_stopword_every_default_off_and_cluster_consistent():
    from dedupe_trees_spark.datagen import (
        _STOPWORD_TAIL, GenConfig, generate_pages_pandas,
    )

    base = generate_pages_pandas(GenConfig(n_docs=400, seed=42))
    same = generate_pages_pandas(GenConfig(n_docs=400, seed=42, stopword_every=0))
    assert (base["text"] == same["text"]).all()  # default is bit-identical
    assert not base["text"].str.contains(" the ").any()

    inj = generate_pages_pandas(GenConfig(n_docs=400, seed=42, stopword_every=2))
    tail = " ".join(_STOPWORD_TAIL)
    assert inj["text"].str.endswith(tail).any()
    assert not inj["text"].str.endswith(tail).all()
    # exact truth clusters must stay byte-identical under injection
    ex = inj[inj.truth_kind == "exact"]
    for _, grp in ex.groupby("truth_cluster"):
        assert grp["text"].nunique() == 1
