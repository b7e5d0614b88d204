"""Column-expression building blocks (all JVM-side unless noted)."""

from dedupe_trees_spark.functions.text import (
    char_ngrams,
    content_hash,
    fingerprint_md5,
    normalize_text,
    shingle_hashes,
    tokens,
    word_shingles,
)

__all__ = [
    "char_ngrams",
    "content_hash",
    "fingerprint_md5",
    "normalize_text",
    "shingle_hashes",
    "tokens",
    "word_shingles",
]
