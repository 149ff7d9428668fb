"""String/set similarity kernels (SURVEY §2.7 F4-F6, §2.11).

- Levenshtein and token-set Jaccard are native expressions (built-in
  ``levenshtein``; array_intersect/array_union) — JVM-side, codegen.
- Jaro-Winkler has no Spark built-in; it is the engine's one
  irreducible string UDF, implemented as an Arrow-batched pandas UDF
  reproducing the reference algorithm exactly
  (/root/reference/src/ml/entity_resolution.py:199-252: match window
  max(len)/2-1, transposition count, prefix boost 0.1·min(4, prefix)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """1 - lev/max(len) (entity_resolution.py:186-196). The reference's
    emptiness guard fires BEFORE the similarity math: either side empty
    → 0.0 (``if not s1 or not s2``), so two suffix-only names that both
    normalize to "" are NOT a match. NULL inputs coalesce to empty and
    hit the same 0.0 branch — the reference treats missing values as
    falsy strings, and without the coalesce the when-condition itself
    is NULL, which would leak NULL (not 0.0) into downstream feature
    vectors and the rule score."""
    a = F.coalesce(a, F.lit(""))
    b = F.coalesce(b, F.lit(""))
    denom = F.greatest(F.length(a), F.length(b))
    return F.when((F.length(a) == 0) | (F.length(b) == 0), F.lit(0.0)).otherwise(
        F.lit(1.0) - F.levenshtein(a, b) / denom.cast("double")
    )


def jaccard_tokens(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| over token arrays (entity_resolution.py:157-164)."""
    aa = F.array_distinct(a)
    bb = F.array_distinct(b)
    union = F.size(F.array_union(aa, bb))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(aa, bb)) / union.cast("double")
    )


def _jaro(s1: str, s2: str, floor_transpositions: bool = False) -> float:
    # Reference order (entity_resolution.py:201-204): emptiness beats
    # equality, so jaro("", "") is 0.0, not 1.0.
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, ch in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == ch:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    # The reference (entity_resolution.py:240-241) halves the raw
    # transposition count as a FLOAT: (matches - t/2) / matches. The
    # textbook/DuckDB convention counts transposition PAIRS (floor).
    # They differ whenever the raw count is odd (~4% of random pairs).
    # Reference semantics are the parity target and the default; the
    # floor variant exists so one query can be oracle-checked against
    # DuckDB's jaro_similarity bit-for-bit.
    th = (t // 2) if floor_transpositions else (t / 2)
    return (matches / len1 + matches / len2 + (matches - th) / matches) / 3.0


def _jaro_winkler(
    s1: str,
    s2: str,
    scaling: float = 0.1,
    floor_transpositions: bool = False,
) -> float:
    j = _jaro(s1, s2, floor_transpositions)
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix == 4:
            break
        prefix += 1
    return j + prefix * scaling * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler, reference semantics; null-safe."""
    out = []
    for a, b in zip(s1, s2):
        if a is None or b is None:
            out.append(None)
        else:
            out.append(_jaro_winkler(a, b))
    return pd.Series(out, dtype="float64")


@pandas_udf(DoubleType())
def jaro_winkler_floor_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Textbook/DuckDB transposition-pair convention (floor)."""
    out = []
    for a, b in zip(s1, s2):
        if a is None or b is None:
            out.append(None)
        else:
            out.append(_jaro_winkler(a, b, floor_transpositions=True))
    return pd.Series(out, dtype="float64")


def jaro_winkler(a: Column, b: Column) -> Column:
    return jaro_winkler_udf(a, b)


def jaro_winkler_textbook(a: Column, b: Column) -> Column:
    return jaro_winkler_floor_udf(a, b)
