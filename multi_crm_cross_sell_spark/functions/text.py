"""Company-name normalization, tokenization and domain extraction
(SURVEY §2.7 F1-F3).

The reference implements these as per-row Python string functions
(/root/reference/src/ml/entity_resolution.py:52-151). Here they are
native expression chains (lower/regexp_replace/split/filter/transform)
that stay JVM-side; the abbreviation map is a literal MAP expression so
expansion is a lookup, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Legal-suffix stoplist — the reference's NameNormalizer.SUFFIXES
# verbatim (entity_resolution.py:56-60), including llp/nv and the
# international/intl/global/worldwide family.
LEGAL_SUFFIXES = (
    "inc", "incorporated", "corp", "corporation", "co", "company",
    "llc", "llp", "ltd", "limited", "plc", "gmbh", "ag", "sa", "nv",
    "holdings", "group", "international", "intl", "global", "worldwide",
)

# Abbreviation expansions — NameNormalizer.ABBREVS verbatim
# (entity_resolution.py:63-73). Expansion runs BEFORE suffix removal,
# so e.g. intl → international → (dropped as a suffix).
ABBREVIATIONS = {
    "intl": "international",
    "corp": "corporation",
    "inc": "incorporated",
    "co": "company",
    "tech": "technology",
    "sys": "systems",
    "svc": "services",
    "svcs": "services",
    "mfg": "manufacturing",
}


def _abbrev_map() -> Column:
    pairs: list[Column] = []
    for k, v in ABBREVIATIONS.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def normalize_company_name(col: Column) -> Column:
    """Lowercase → strip punctuation (keep '&') → expand abbreviations
    → drop legal suffixes → collapse whitespace
    (entity_resolution.py:75-98), as one expression chain.
    """
    lowered = F.lower(F.trim(col))
    # Reference char class is Python \w (unicode-aware): keep letters,
    # digits, underscore, whitespace and '&'; everything else → space.
    # \p{L}\p{N}_ spells that out identically in Java regex and in
    # DuckDB's RE2, so oracles can use the same pattern.
    stripped = F.regexp_replace(lowered, r"[^\p{L}\p{N}_&\s]", " ")
    toks = F.filter(F.split(stripped, r"\s+"), lambda t: t != "")
    m = _abbrev_map()
    expanded = F.transform(toks, lambda t: F.coalesce(m[t], t))
    suffixes = F.array(*[F.lit(s) for s in LEGAL_SUFFIXES])
    kept = F.filter(expanded, lambda t: ~F.array_contains(suffixes, t))
    return F.array_join(kept, " ")


def name_tokens(col: Column, min_len: int = 2) -> Column:
    """Normalized token array, dropping tokens of length ≤ min_len
    (entity_resolution.py:100-106)."""
    return F.filter(
        F.split(normalize_company_name(col), " "),
        lambda t: F.length(t) > min_len,
    )


def domain_from_url(col: Column) -> Column:
    """Hostname from a URL/email, ``www.`` stripped
    (entity_resolution.py:109-139): parse_url for URLs, split on '@'
    for emails."""
    with_scheme = F.when(
        col.contains("@"),
        F.concat(F.lit("https://"), F.element_at(F.split(col, "@"), -1)),
    ).otherwise(
        F.when(col.rlike(r"^[a-z]+://"), col).otherwise(F.concat(F.lit("https://"), col))
    )
    host = F.lower(F.parse_url(with_scheme, F.lit("HOST")))
    return F.regexp_replace(host, r"^www\.", "")


def root_domain(col: Column) -> Column:
    """Last two dot-labels of a hostname (entity_resolution.py:141-151):
    'a.b.acme.com' → 'acme.com'."""
    parts = F.split(col, r"\.")
    return F.array_join(F.slice(parts, -2, 2), ".")
