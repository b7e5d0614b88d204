"""Per-domain corpus shaping: stats, caps, and deterministic sampling.

Web-scale training pipelines bound how much any one registered domain
contributes (content farms and mirror hosts otherwise dominate the
token budget) and draw reproducible mixture samples per stratum
(language, source, quality band). Reference parity: dedupe_trees has
no corpus-shaping operators (SURVEY.md §2.1); these are part of the
mandated training-data superset.

Operators:

* ``extract_domain`` — pure-codegen host extraction (scheme strip,
  lowercase, port strip, leading-``www.`` strip), oracle-mirrored.
* ``domain_cap`` — keep at most ``cap`` documents per domain,
  deterministically (the ``cap`` smallest ``(order_col, id_col)`` keys).
  Built WINDOW-FREE: the textbook ``row_number() OVER (PARTITION BY
  domain)`` funnels every row of a hot domain (10^7+ docs for a large
  content farm) into one task. Here each task computes its own per-salt
  top-``cap`` with ``sort_array``+``slice`` over groups of ~m/S rows,
  a second agg merges the ≤ S·cap per-domain survivors into the exact
  cap-th-smallest threshold key, and the corpus is filtered by
  ``key <= threshold`` (keys are unique, so exactly min(m, cap) rows
  survive per domain). The window twin (``domain_cap_window``) exists
  only as the oracle for the equivalence pytest — same adjudication as
  ``operators/paragraphs.py``'s keeper.
* ``temperature_resample`` — counts^alpha stratum rebalancing (the
  standard multilingual-LM mixing step): per-stratum keep fractions
  derived from one |strata|-row agg, applied with the same md5
  predicate; c_min-anchored so no float normalization sum exists and
  the kept set is oracle-exact.
* ``deterministic_sample`` / ``stratified_sample`` — reproducible,
  engine-portable sampling: keep a row iff the first 8 hex chars of
  ``md5(key)`` sort below the fraction's hex threshold. md5 hex is
  lowercase in both Spark and DuckDB, so the predicate is oracle-exact
  (unlike xxhash64, which DuckDB lacks), stable under repartitioning,
  and needs no RNG state — the property that matters when a 100 TB
  sample must be reproducible across reruns and engines.

Scale notes: ``domain_cap`` shuffles (domain, salt) partial top-caps —
S·cap rows per domain, NOT the corpus — then joins thresholds back on
``domain``. The threshold table is one row per domain; it is broadcast
when ``broadcast_thresholds=True`` (default — fine up to ~10^7
domains), else a sort-merge join on domain with AQE skew handling.
Sampling is a pure filter: zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fraction of the 32-bit md5-prefix space, as an 8-hex-digit string
_MD5_SPACE = 1 << 32


def _frac_threshold(frac: float) -> str:
    """Hex string T such that P(md5_prefix8 < T) == frac (to 1/2^32)."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    return format(min(int(frac * _MD5_SPACE), _MD5_SPACE - 1), "08x")


def extract_domain(url: Column | str) -> Column:
    """Registered host of a URL: scheme/port/leading-www stripped,
    lowercased. Pure codegen; mirrored 1:1 by SQL_DOMAIN in queries.py."""
    c = F.col(url) if isinstance(url, str) else url
    host = F.regexp_extract(F.lower(c), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    host = F.regexp_replace(host, r":\d+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    order_col: str = "url",
    id_col: str = "doc_id",
    salts: int = 64,
    broadcast_thresholds: bool = True,
) -> DataFrame:
    """Keep the ``cap`` smallest ``(order_col, id_col)`` rows per domain.

    Exact and deterministic for unique ``(order_col, id_col)`` keys;
    window-free and skew-safe (see module docstring).

    Memory sizing: the phase-1 aggregation buffers ``m_domain / salts``
    KEYS (url+id structs, ~100 B each — never full rows) per group.
    The default 64 keeps a 10^7-doc domain at ~16 MB/group; size
    ``salts`` so the hottest expected domain over ``salts`` stays
    around 10^5 keys (e.g. 10^9-doc domain → salts=10^4; the phase-2
    merge then still sees only ``salts × cap`` rows per domain).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    key = F.struct(F.col(order_col), F.col(id_col))
    keyed = df.withColumn("_key", key)
    salt = F.pmod(F.xxhash64(F.col(order_col), F.col(id_col)), F.lit(salts))
    partial = (
        keyed.groupBy(F.col(domain_col), salt.alias("_salt"))
        .agg(F.slice(F.sort_array(F.collect_list("_key")), 1, cap).alias("_top"))
    )
    thresholds = (
        partial.groupBy(domain_col)
        .agg(
            F.slice(F.sort_array(F.flatten(F.collect_list("_top"))), 1, cap)
            .alias("_merged")
        )
        # cap-th smallest key, or the largest present if the domain has
        # fewer than cap rows (then the filter keeps everything)
        .select(
            domain_col,
            F.element_at("_merged", F.least(F.size("_merged"), F.lit(cap)))
            .alias("_thr"),
        )
    )
    if broadcast_thresholds:
        thresholds = F.broadcast(thresholds)
    return (
        keyed.join(thresholds, domain_col)
        .filter(F.col("_key") <= F.col("_thr"))
        .drop("_key", "_thr")
    )


def domain_cap_window(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    order_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Textbook row_number formulation — the equivalence oracle for
    ``domain_cap``. NOT for production: hot domains serialize."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(order_col, id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def deterministic_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id"
) -> DataFrame:
    """Reproducible ~``frac`` sample: md5-prefix threshold on ``key_col``.

    Pure filter (no exchange, no RNG state); identical row set in any
    engine with lowercase-hex md5 — the DuckDB oracle runs the same
    predicate verbatim.
    """
    pref = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    return df.filter(pref < _frac_threshold(frac))


def stratified_sample(
    df: DataFrame, fractions: dict[str, float], strata_col: str,
    key_col: str = "doc_id", default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample (mixture weighting).

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_frac``. Same md5-prefix predicate as
    ``deterministic_sample``, with the threshold chosen per row by the
    stratum column — still a pure filter.
    """
    thr = F.lit(_frac_threshold(default_frac))
    for val, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == val, F.lit(_frac_threshold(frac))
        ).otherwise(thr)
    pref = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    return df.filter(pref < thr)


def temperature_resample(
    df: DataFrame,
    strata_col: str = "lang",
    alpha: float = 0.5,
    key_col: str = "doc_id",
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-based stratum rebalancing (multilingual-LM mixing).

    Downsamples over-represented strata so the kept corpus follows
    counts^alpha instead of raw counts: each stratum keeps fraction
    ``f_s = (c_min / c_s)^(1-alpha)`` where ``c_s`` is the stratum's
    doc count and ``c_min`` the smallest stratum's. alpha=1 keeps
    everything (natural distribution); alpha=0 keeps ~c_min docs per
    stratum (uniform); alpha=0.5 is the usual multilingual compromise.
    This ``c_min``-anchored form needs NO normalizing sum over float
    weights — the only float ops are one division of exact integer
    counts and (at alpha=0.5) one IEEE-correctly-rounded sqrt, so the
    kept row set is bit-reproducible across engines and the DuckDB
    oracle can assert exact equality. Row selection reuses the
    md5-prefix predicate (engine-portable, repartition-stable, no RNG
    state); ``f_s == 1.0`` strata skip the hash test entirely so the
    rarest stratum is kept whole rather than losing the one-in-2^32
    ``ffffffff`` edge.

    Scale: the counts agg exchanges |strata| rows after map-side
    partial aggregation; the per-stratum fraction table (|strata|
    rows) is broadcast back; the corpus itself is scanned twice and
    shuffled never.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # weight_col (e.g. a BPE token count, functions/bpe.py) switches the
    # stratum mass from doc counts to TOKEN budgets — what a training
    # mixture actually balances. Integer sums keep the c_min/c_s ratio
    # an exact-int division, preserving the bit-reproducibility
    # argument above; the sampling unit stays the whole doc.
    mass = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    counts = df.groupBy(strata_col).agg(mass.alias("_cnt"))
    cmin = counts.agg(F.min("_cnt").alias("_cmin"))
    ratio = F.col("_cmin") / F.col("_cnt")
    if alpha == 0.5:
        keep_f = F.sqrt(ratio)  # IEEE-exact, unlike pow(x, 0.5)
    else:
        keep_f = F.pow(ratio, F.lit(1.0 - alpha))
    fracs = counts.crossJoin(F.broadcast(cmin)).select(
        strata_col,
        keep_f.alias("_keep_f"),
        F.lower(
            F.lpad(
                F.hex(F.floor(keep_f * F.lit(float(_MD5_SPACE))).cast("bigint")),
                8,
                "0",
            )
        ).alias("_thr"),
    )
    pref = F.substring(F.md5(F.col(key_col).cast("string")), 1, 8)
    return (
        df.join(F.broadcast(fracs), strata_col)
        .filter((F.col("_keep_f") >= 1.0) | (pref < F.col("_thr")))
        .drop("_keep_f", "_thr")
    )


def block_urls(
    df: DataFrame,
    blocked_domains: DataFrame | list[str] | None = None,
    url_patterns: list[str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-hygiene filter: drop rows whose registered domain is on a
    blocklist or whose URL matches any blocked regex.

    Blocklists in production are 10^5–10^7 registered domains — far too
    big for a literal IN expression but tiny next to the corpus, so the
    domain check is a broadcast LEFT ANTI join on ``extract_domain``
    (corpus scanned, never shuffled). Pattern rules compile to an OR of
    ``rlike`` predicates — pure codegen in the same scan. Passing a
    plain list builds the blocklist DataFrame on the driver.
    """
    out = df
    if blocked_domains is not None:
        if isinstance(blocked_domains, list):
            spark = df.sparkSession
            bl = spark.createDataFrame(
                [(d,) for d in blocked_domains], ["_blocked_domain"]
            )
        else:
            bl = blocked_domains.toDF("_blocked_domain")
        out = (
            out.withColumn("_dom", extract_domain(url_col))
            .join(
                F.broadcast(bl),
                F.col("_dom") == F.col("_blocked_domain"),
                "left_anti",
            )
            .drop("_dom")
        )
    if url_patterns:
        hit = None
        for pat in url_patterns:
            p = F.col(url_col).rlike(pat)
            hit = p if hit is None else (hit | p)
        out = out.filter(~hit)
    return out


def extract_links(html: Column | str) -> Column:
    """All href="..." targets in an HTML string (array<string>).

    Pure codegen (`regexp_extract_all`); the RE2-compatible pattern is
    shared verbatim with the DuckDB oracle. Quote-delimited hrefs only
    — the deliberate, documented subset (same stance as html_to_text's
    regex tag strip).
    """
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(c, F.lit(r'href="([^"]*)"'), F.lit(1))


def outlink_stats(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Link-graph foundation: per target registered domain, the total
    outlink count and the number of distinct linking documents.

    Shape at 10^12 docs: extract + explode are pipeline-local over the
    scan (~links/doc rows, same volume class as the gram build); the
    ONLY exchange is the partial-aggregated groupBy on target domain.
    Skewed in-link domains (every page links example.com) are safe:
    count is fixed-width and partially aggregated map-side; the
    distinct-doc count shuffles (domain, doc) once — candidate for a
    sketch (HLL) at extreme scale, exact here.
    """
    links = df.select(
        F.col(id_col).alias("_src"),
        F.explode(extract_links(html_col)).alias("_link"),
    )
    return (
        links.withColumn("domain", extract_domain("_link"))
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("_src").alias("n_docs"),
        )
    )
