"""Deterministic synthetic Common-Crawl-style pages with planted
duplicate clusters (FIXTURES.md §B).

Schema = BASELINE.json input_hint (url, warc_ts, html, text, lang) +
lineage (source, source_order) + held-out ground truth (truth_cluster,
truth_kind). No external data; everything derives from (seed, doc_id)
via numpy SeedSequence, so generation is embarrassingly parallel
(mapInPandas over spark.range) and any member can recompute its cluster
root's text locally — no shuffle, no driver state, works at any n_docs.

Cluster layout is id-arithmetic: ids are grouped in fixed-size blocks;
a seeded hash of the block id picks the block type (unique / exact /
near / substr / copy-named exact). A separate "hot" template cluster
takes every ``hot_every``-th id to force skewed LSH band buckets.
"""

from __future__ import annotations

import datetime
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "source string, source_order int, truth_cluster long, truth_kind string"
)

# ~160-word vocabulary: big enough that random 3-shingles rarely collide,
# small enough to look like templated web text.
_VOCAB = [
    f"{w}{i}" for i in range(8)
    for w in ("data", "web", "page", "crawl", "index", "link", "site", "text",
              "news", "shop", "forum", "wiki", "blog", "user", "item", "post",
              "view", "list", "main", "home")
]
_LANGS = ["en", "zh", "es", "de", "fr"]

# appended verbatim when GenConfig.stopword_every > 0 (all 8 Gopher
# stopwords as whole tokens, so flag_stop can pass on synthetic text)
_STOPWORD_TAIL = "it is the case that we have to be of use and go with".split()
_LANG_W = np.array([0.45, 0.15, 0.15, 0.15, 0.10])
_EPOCH = datetime.datetime(2024, 1, 1)


@dataclass(frozen=True)
class GenConfig:
    n_docs: int = 5000
    seed: int = 42
    # first doc id — docs are a pure function of (seed, doc_id), so
    # id_start=16_000_000 generates exactly the rows a 16.1M-doc run
    # would produce for those ids: the natural way to synthesize a
    # "next crawl increment" of an existing corpus (incremental index
    # benchmarks use this)
    id_start: int = 0
    block: int = 20          # ids per layout block
    n_sources: int = 20
    hot_every: int = 200     # every k-th id joins the hot template cluster
    hot_block_exempt: int = 0
    # near-dup token-substitution rates → shingle-Jaccard ~0.95/0.9/0.85/0.8
    near_rates: tuple = (0.012, 0.025, 0.04, 0.055)
    mean_tokens: int = 120
    truth_cols: bool = True
    vocab: list[str] = field(default_factory=lambda: list(_VOCAB))
    # 0 (default) = off, bit-identical to historical outputs. When k>0,
    # every k-th CLUSTER (keyed on the truth root, so exact copies stay
    # byte-identical and near members share the tail) gets an appended
    # English-stopword sentence — lets Gopher-style stopword rules pass
    # on synthetic corpora (the base vocab has no English stopwords).
    # Near-dup Jaccard shifts slightly upward for injected clusters
    # (+8 shared tokens); keep off for calibration-sensitive benches.
    stopword_every: int = 0


def _block_type(cfg: GenConfig, block_id: int) -> tuple[str, int]:
    """(type, members) for a block — pure function of (seed, block_id)."""
    h = zlib.crc32(f"{cfg.seed}:{block_id}".encode()) & 0xFFFFFFFF
    r = h % 100
    if r < 60:
        return "unique", 0
    if r < 75:
        return "exact", 2 + h // 100 % 4          # 2–5 members
    if r < 90:
        return "near", 2 + h // 100 % 7           # 2–8 members
    if r < 95:
        return "substr", 2 + h // 100 % 3         # 2–4 members
    return "copy", 2 + h // 100 % 3               # exact + copy-pattern names


def _rng(cfg: GenConfig, doc_id: int, tag: int = 0) -> np.random.Generator:
    return np.random.default_rng([cfg.seed, tag, doc_id])


def _base_text(
    cfg: GenConfig, doc_id: int, n_tokens: int | None = None, tag: int = 1
) -> list[str]:
    rng = _rng(cfg, doc_id, tag=tag)
    if n_tokens is None:
        n_tokens = int(rng.integers(50, 2 * cfg.mean_tokens))
    idx = rng.integers(0, len(cfg.vocab), size=n_tokens)
    return [cfg.vocab[i] for i in idx]


def _near_edit(cfg: GenConfig, root_tokens: list[str], doc_id: int, rate: float) -> list[str]:
    rng = _rng(cfg, doc_id, tag=2)
    toks = list(root_tokens)
    n = len(toks)
    n_sub = max(1, int(round(rate * n)))
    pos = rng.choice(n, size=min(n_sub, n), replace=False)
    repl = rng.integers(0, len(cfg.vocab), size=len(pos))
    for p, r in zip(pos, repl):
        toks[p] = cfg.vocab[r]
    return toks


def _doc_meta(cfg: GenConfig, doc_id: int) -> tuple[str, str, int, int]:
    """(kind, role) classification of one id. Returns
    (kind, text_kind, root_id, member_idx)."""
    if cfg.hot_every and doc_id % cfg.hot_every == 0:
        return ("hot", "near", 0, doc_id // cfg.hot_every)
    block_id, off = divmod(doc_id, cfg.block)
    btype, m = _block_type(cfg, block_id)
    root = block_id * cfg.block
    # the block root may itself be a hot member; then the block is unique
    if cfg.hot_every and root % cfg.hot_every == 0:
        return ("unique", "unique", doc_id, 0)
    if btype == "unique" or off >= m:
        return ("unique", "unique", doc_id, 0)
    return (btype, btype, root, off)


def _one_doc(cfg: GenConfig, doc_id: int) -> dict:
    kind, _, root, off = _doc_meta(cfg, doc_id)
    rng = _rng(cfg, doc_id, tag=3)
    root_rng = _rng(cfg, root, tag=4)

    lang = _LANGS[int(root_rng.choice(len(_LANGS), p=_LANG_W))]
    truth_kind = "unique"
    truth_cluster = -1

    if kind == "unique":
        toks = _base_text(cfg, doc_id)
    elif kind == "hot":
        # one big template cluster: tiny edit rate, shared root text
        root_toks = _base_text(cfg, 0, n_tokens=200, tag=5)
        toks = _near_edit(cfg, root_toks, doc_id, 0.01) if off > 0 else root_toks
        truth_kind, truth_cluster = "near", 0
        lang = "en"
    elif kind in ("exact", "copy"):
        toks = _base_text(cfg, root)
        truth_kind, truth_cluster = "exact", root
    elif kind == "near":
        root_toks = _base_text(cfg, root)
        rate = cfg.near_rates[root // cfg.block % len(cfg.near_rates)]
        toks = _near_edit(cfg, root_toks, doc_id, rate) if off > 0 else root_toks
        truth_kind, truth_cluster = "near", root
    elif kind == "substr":
        root_toks = _base_text(cfg, root, n_tokens=300)
        if off == 0:
            toks = root_toks
        else:
            # embed a verbatim ≥200-char span inside otherwise-unique text
            span_start = int(rng.integers(0, 150))
            span = root_toks[span_start : span_start + 60]
            pre = _base_text(cfg, doc_id)[:40]
            post = _base_text(cfg, doc_id)[40:80]
            toks = pre + span + post
        truth_kind, truth_cluster = "substr", root
    else:  # pragma: no cover
        raise AssertionError(kind)

    if cfg.stopword_every > 0:
        key = root if truth_kind != "unique" else doc_id
        if key % cfg.stopword_every == 0:
            toks = toks + _STOPWORD_TAIL
    text = " ".join(toks)
    src = int(rng.integers(0, cfg.n_sources))
    depth = int(rng.integers(1, 7))
    dirs = "/".join(f"d{int(x)}" for x in rng.integers(0, 10, size=depth - 1))
    name = f"page{doc_id}.html"
    if kind == "copy" and off > 0:
        name = f"Copy of page{root}.html" if off % 2 else f"page{root} ({off}).html"
    path = f"{dirs}/{name}" if dirs else name
    ts = _EPOCH + datetime.timedelta(seconds=int(rng.integers(0, 365 * 24 * 3600)))

    row = {
        "url": f"https://src{src}.example/{path}",
        "warc_ts": ts,
        "html": b"<html><body>" + text.encode() + b"</body></html>",
        "text": text,
        "lang": lang,
        "source": f"src{src}",
        "source_order": src,
    }
    if cfg.truth_cols:
        row["truth_cluster"] = truth_cluster
        row["truth_kind"] = truth_kind
    return row


def gen_batch(cfg: GenConfig, ids: np.ndarray) -> pd.DataFrame:
    rows = [_one_doc(cfg, int(i)) for i in ids]
    return pd.DataFrame(rows)


def generate_pages(spark, cfg: GenConfig, partitions: int | None = None):
    """Distributed deterministic generation: spark.range → mapInPandas."""
    n_part = partitions or max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(cfg.id_start, cfg.id_start + cfg.n_docs, 1, n_part)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_batch(cfg, pdf["id"].to_numpy())

    schema = SCHEMA if cfg.truth_cols else SCHEMA.rsplit(", truth_cluster", 1)[0]
    return base.mapInPandas(gen, schema=schema)


def generate_pages_pandas(cfg: GenConfig) -> pd.DataFrame:
    """Driver-side twin of generate_pages (same rows) for small fixtures."""
    return gen_batch(cfg, np.arange(cfg.id_start, cfg.id_start + cfg.n_docs))
