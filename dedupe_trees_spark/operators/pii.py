"""PII scrubbing for web-text training corpora.

The standard pre-training hygiene pass (C4 / Dolma / RefinedWeb style):
replace e-mail addresses, IPv4 addresses, US-SSN-shaped ids, and
dashed phone numbers with fixed placeholder tokens, and count matches
per document for audit reports.

Everything is a chain of ``regexp_replace`` / ``regexp_extract_all``
column expressions — pure whole-stage codegen, zero UDFs, zero
exchanges: at 100 TB this runs as a map-only pass fused into whatever
scan or filter stage precedes it. The patterns are deliberately
restricted to the RE2-compatible subset (no lookaround, no
backreferences) so the DuckDB oracle executes the *same* regex strings
(generated from :data:`PII_PATTERNS` below — single source of truth).

Replaces nothing in the reference (dedupe_trees has no text hygiene);
this is the web-scale superset capability the north rule's
Common-Crawl framing requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, RE2+Java-compatible regex, replacement token), applied in order.
# E-mail first (its local part may contain digits/dots that the later
# numeric patterns could nibble at); SSN before phone is safe either way
# because the \b anchors make the two dash shapes mutually exclusive.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP_ADDRESS>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def scrub_pii(col: Column | str) -> Column:
    """Return ``col`` with every PII match replaced by its placeholder.

    One nested ``regexp_replace`` per pattern — a single codegen'd
    projection; Spark replaces all occurrences by default (the oracle
    SQL passes the ``'g'`` flag for the same semantics).
    """
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (for audit stats), keyed ``n_<kind>s``."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{kind}s": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat, _ in PII_PATTERNS
    }


def scrub_pii_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach ``<text_col>_scrubbed`` plus per-kind counts to ``df``.

    Map-only: the executed plan for this stage contains no Exchange and
    no Python worker (plan-asserted in tests/test_pii.py).
    """
    out = df.withColumn(f"{text_col}_scrubbed", scrub_pii(text_col))
    for name, expr in pii_counts(text_col).items():
        out = out.withColumn(name, expr)
    return out


def pii_oracle_sql(text_expr: str) -> tuple[str, list[str]]:
    """DuckDB twins generated from the SAME pattern table.

    Returns ``(scrub_expr, [count_expr AS n_<kind>s, ...])`` where every
    regex string is byte-identical to what the Spark side compiles.
    """
    scrub = text_expr
    counts = []
    for kind, pat, token in PII_PATTERNS:
        lit = pat.replace("'", "''")
        scrub = f"regexp_replace({scrub}, '{lit}', '{token}', 'g')"
        counts.append(
            f"len(regexp_extract_all({text_expr}, '{lit}')) AS n_{kind}s"
        )
    return scrub, counts
