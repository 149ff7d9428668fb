"""Overflow guard for the long-units parity path (plans/_parity.py).

dsum/davg accumulate ROUND(x * 10^f) as BIGINT; in non-ANSI Spark a
sum crossing 2^63 would wrap silently (the bound is crossed near
sf ≈ 40 on lineitem sums with f=6). Under spark.sql.ansi.enabled the
same plan THROWS on long overflow — so running the heaviest dsum/davg
queries under ANSI pins two things at once:

1. the bound genuinely holds at test scale (values equal the
   non-ANSI run's, no wrap anywhere), and
2. the failure mode at production scale is loud (ArithmeticException),
   not silent corruption — the deployment guard is "enable ANSI, or
   flip to the decimal/double path above the documented sf bound".
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from multi_crm_cross_sell_spark.plans import all_queries

SF = "/root/testdata/sf0.01"

# The queries whose oracle-checked sums ride the long-units path.
DSUM_QUERIES = ["pricing_summary", "join_revenue_by_nation"]


@pytest.mark.parametrize("name", DSUM_QUERIES)
def test_long_units_sums_hold_under_ansi(spark, name):
    q = all_queries()[name]
    plain = q.fn(spark, SF).collect()
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = q.fn(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert sorted(map(tuple, plain)) == sorted(map(tuple, ansi)), (
        f"{name}: ANSI and non-ANSI disagree — a long-units "
        "accumulator wrapped at test scale"
    )


def test_textrank_integer_fixpoint_holds_under_ansi(spark):
    """textrank_keywords' r*cnt products must not overflow at test
    scale, and the failure mode at production scale must be loud:
    under ANSI the identical plan throws on bigint overflow instead
    of wrapping (see the query docstring's bound)."""
    q = all_queries()["textrank_keywords"]
    plain = q.fn(spark, SF).collect()
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = q.fn(spark, SF).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    assert sorted(map(tuple, plain)) == sorted(map(tuple, ansi))
