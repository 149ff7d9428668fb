"""PII redaction for training-data pipelines: detect and mask
emails, phone numbers, SSNs and IPv4 addresses in text columns.

A standard pre-training scrub step (beyond-reference surface next to
dedup/quality/language-ID): every pattern is a pure column expression
(`regexp_replace` / `regexp_extract_all` — JVM, codegen, no UDF), so
redaction runs at scan speed and composes with the rest of the
document pipeline. Patterns deliberately use only syntax shared by
Java regex (Spark) and RE2 (DuckDB oracle): character classes, \\b,
bounded repeats — no lookarounds — so the oracle can verify the FULL
redacted text by md5, not just the counts.

Replacement order is part of the contract (applied email → ssn →
phone → ip); overlapping matches resolve identically in any engine
that applies the same order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters and is part of the
# redaction contract.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(text: Column) -> Column:
    """Mask every PII pattern, in contract order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> list[Column]:
    """One count column per pattern (`n_<name>`), counted on the RAW
    text (before any masking) so counts are order-independent."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def sql_redact_pii(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` (RE2, 'g' flag for
    replace-all to match Spark's semantics)."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_pii_counts(expr: str) -> list[str]:
    return [
        f"LEN(regexp_extract_all({expr}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]
