"""Text primitives as Catalyst column expressions.

Everything here stays JVM-side (whole-stage codegen); no Python executes
per row. These are the shared building blocks for exact hashing
(reference semantics: dedupe_trees FileEntry content digest — SURVEY.md
§2.1 R2), MinHash shingling, SimHash token hashing, and the substring
fingerprint stages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Casefold + collapse runs of whitespace to single spaces + trim.

    Applied once at ingest (pipeline S1). NOTE: the byte-identical-text
    invariant (BASELINE.json input_hint) is checked on the *raw* ``text``
    column; normalization feeds only the signature stages.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_hash(col: Column | str) -> Column:
    """64-bit content hash (Spark-native xxhash64) — the exact-dup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def fingerprint_md5(col: Column | str) -> Column:
    """128-bit hex content fingerprint; oracle-comparable (DuckDB md5())."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def tokens(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def word_shingles(col: Column | str, k: int = 3, sep: str = " ") -> Column:
    """All k-word shingles (stride 1) as array<string>, duplicates kept.

    ``transform(sequence(...))`` keeps generation inside codegen. Documents
    with fewer than k tokens yield a single shingle of all their tokens,
    so short docs still participate in MinHash.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, sep)
    n = F.size(toks)
    start_idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.transform(
        start_idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )


def shingle_hashes(col: Column | str, k: int = 3) -> Column:
    """Distinct xxhash64 of each k-word shingle → array<bigint>.

    This is the set representation used for MinHash input AND for exact
    Jaccard verification of candidate pairs (array_intersect on hashes).
    Hashing shingle strings JVM-side means the pandas UDF that computes
    MinHash signatures only ever sees int64 arrays — pure NumPy work.
    """
    sh = word_shingles(col, k=k)
    return F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))


def char_ngrams(col: Column | str, k: int, stride: int = 1) -> Column:
    """All k-char substrings at the given stride → array<string>.

    stride=1 gives true substring semantics (every window); larger strides
    are only used as one side of an asymmetric gram join. Empty for texts
    shorter than k.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1, F.lit(stride)),
            lambda i: F.substring(c, i, k),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_hashes(col: Column | str, sep: str = " ") -> Column:
    """Per-token xxhash64 → array<bigint>, a single O(n) JVM pass.

    This is the scale-path input to the combined signature UDF
    (functions.minhash.signature_udf): k-gram shingle hashes are mixed
    from consecutive token hashes in NumPy, because building k-gram
    STRINGS in a higher-order lambda re-evaluates the captured token
    array per element (Catalyst inlines the alias after collapsing
    projections) — O(n²) and ~40× slower, measured.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, sep), lambda s: F.xxhash64(s))


# query-param names stripped by normalize_url (tracking-only params that
# never change page content — the standard crawl-canonicalization list)
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid=", "gclid=", "msclkid=")


def normalize_url(col: Column | str) -> Column:
    """Canonical URL for crawl-level dedup (JVM-side, oracle-exact).

    Rules (deliberately deterministic + SQL-twinnable, in order):

    1. drop the ``#fragment``;
    2. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
       ``msclkid``); remaining params keep their original order — NOT
       sorted, so ``?a=1&b=2`` and ``?b=2&a=1`` stay distinct (reorder
       canonicalization is lossy on servers that care);
    3. lowercase the ``scheme://host[:port]`` origin, strip a leading
       ``www.`` and the scheme-default port (``:443``/``:80``);
    4. collapse a trailing ``/`` run on the path (root stays ``/``;
       an empty path becomes ``/``).

    Used by the re-crawl collapse when PipelineConfig.normalize_urls is
    set, and by the url_canonical_groups contract query. A pure map —
    no shuffle, no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    nofrag = F.split_part(c, F.lit("#"), F.lit(1))
    base = F.split_part(nofrag, F.lit("?"), F.lit(1))
    q = F.split_part(nofrag, F.lit("?"), F.lit(2))
    kept = F.filter(
        F.split(q, "&"),
        lambda p: ~(
            p.startswith("utm_")
            | p.startswith("fbclid=")
            | p.startswith("gclid=")
            | p.startswith("msclkid=")
        ),
    )
    qf = F.array_join(kept, "&")
    origin_re = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"
    origin_raw = F.regexp_extract(base, origin_re, 0)
    rest = F.substr(base, F.length(origin_raw) + 1)
    origin0 = F.replace(F.lower(origin_raw), F.lit("://www."), F.lit("://"))
    origin = (
        F.when(
            origin0.startswith("https://") & origin0.endswith(":443"),
            F.substr(origin0, F.lit(1), F.length(origin0) - 4),
        )
        .when(
            origin0.startswith("http://") & origin0.endswith(":80"),
            F.substr(origin0, F.lit(1), F.length(origin0) - 3),
        )
        .otherwise(origin0)
    )
    path0 = F.regexp_replace(rest, r"/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    return F.concat(
        origin,
        path,
        F.when(qf != "", F.concat(F.lit("?"), qf)).otherwise(F.lit("")),
    )


def html_to_text(col: Column | str) -> Column:
    """Extract visible text from an HTML string — pure codegen, no UDF.

    The input_hint's per-row invariant is "byte-identical extracted
    text per url": on Common-Crawl-style pages whose ``html`` wraps the
    stored ``text`` (the datagen corpus, and the WARC convention the
    fixture mirrors), this extraction reproduces ``text`` exactly —
    pytest-pinned end-to-end and oracle-checked cross-engine.

    Rules (applied in order; every pattern is RE2-compatible, no
    backreferences, so the DuckDB oracle twin runs the SAME patterns):
    script blocks, style blocks, comments, all remaining tags, then
    the five basic entities with ``&amp;`` decoded LAST so encoded
    entities don't double-decode. Binary html columns decode with
    ``F.decode(col, 'UTF-8')`` before this.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", "")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", "")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"<[^>]*>", "")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c
