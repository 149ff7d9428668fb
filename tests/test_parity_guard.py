"""Overflow guard for the long-units parity path (plans/_parity.py).

dsum/davg accumulate ROUND(x * 10^f) as BIGINT via TRY_SUM plus an
explicit raise: try_sum returns NULL on long overflow in BOTH ANSI
modes, and _guarded_unit_sum converts that NULL (on a non-empty
group) into RAISE_ERROR — so a wrong-answer-by-wrap is impossible
regardless of the deployment's spark.sql.ansi.enabled setting. The
bound (|sum·10^f| < 2^63, crossed near sf ≈ 40 on lineitem sums with
f=6) is documented in _parity.py; these tests pin:

1. the bound genuinely holds at test scale (ANSI and non-ANSI runs
   agree value-for-value — no wrap anywhere), and
2. a synthetic crossing RAISES loudly in both ANSI modes instead of
   returning a wrapped sum or a silent NULL.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.plans import all_queries
from multi_crm_cross_sell_spark.plans._parity import dsum, spark_sql_dsum

SF = "/root/testdata/sf0.01"

# The queries whose oracle-checked sums ride the long-units path.
DSUM_QUERIES = ["pricing_summary", "join_revenue_by_nation"]


@contextlib.contextmanager
def _with_ansi(spark, value: str):
    """Set ansi.enabled, restoring the PRIOR value (Spark 4 defaults
    it to true — a hardcoded restore would flip the whole suite)."""
    prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", value)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)


@pytest.mark.parametrize("name", DSUM_QUERIES)
def test_long_units_sums_hold_under_both_ansi_modes(spark, name):
    q = all_queries()[name]
    with _with_ansi(spark, "false"):
        plain = q.fn(spark, SF).collect()
    with _with_ansi(spark, "true"):
        ansi = q.fn(spark, SF).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, ansi)), (
        f"{name}: ANSI and non-ANSI disagree — a long-units "
        "accumulator wrapped at test scale"
    )


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_synthetic_overflow_raises_loudly(spark, ansi):
    """A sum that crosses 2^63 in unit space must raise the
    _parity.py overflow error — never wrap (non-ANSI plain-sum
    behavior) and never return NULL silently."""
    # 3 rows of 4e16 with f=2 → units 4e18 each, sum 1.2e19 > 2^63.
    df = spark.range(3).select(F.lit(4.0e16).alias("x"))
    with _with_ansi(spark, ansi):
        with pytest.raises(Exception, match="long-units overflow"):
            df.agg(dsum("x", "s")).collect()


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_guard_passes_below_bound_and_on_empty_groups(spark, ansi):
    """The guard must not fire on legitimate data: values below the
    bound sum exactly, and an all-NULL / empty group yields NULL (the
    SQL sum convention) rather than a spurious raise."""
    with _with_ansi(spark, ansi):
        df = spark.range(4).select((F.col("id") * 1.25).alias("x"))
        [row] = df.agg(dsum("x", "s")).collect()
        assert row.s == pytest.approx(7.5)
        empty = df.where(F.lit(False))
        [row] = empty.agg(dsum("x", "s")).collect()
        assert row.s is None


def test_textrank_integer_fixpoint_holds_under_ansi(spark):
    """textrank_keywords' r*cnt products must not overflow at test
    scale, and the failure mode at production scale must be loud:
    under ANSI the identical plan throws on bigint overflow instead
    of wrapping (see the query docstring's bound)."""
    q = all_queries()["textrank_keywords"]
    with _with_ansi(spark, "false"):
        plain = q.fn(spark, SF).collect()
    with _with_ansi(spark, "true"):
        ansi = q.fn(spark, SF).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, ansi))


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_single_row_cast_saturation_raises_loudly(spark, ansi):
    """ADVICE round-7: per-ROW overflow is a separate surface from
    accumulator overflow — under non-ANSI, CAST(double AS BIGINT)
    SATURATES (no wrap, no NULL), so one |x·10^f| >= 2^63 row used to
    produce a finite wrong sum that try_sum never flagged. The
    per-row abs-compare guard must raise instead, in both modes."""
    # ONE row of 1e17 with f=2 → units 1e19 >= 2^63: saturation zone.
    df = spark.range(1).select(F.lit(1.0e17).alias("x"))
    with _with_ansi(spark, ansi):
        with pytest.raises(Exception, match="long-units overflow"):
            df.agg(dsum("x", "s")).collect()


def _sql_dsum_agg(spark, df, scale="decimal(23,2)"):
    return spark.sql(
        f"SELECT {spark_sql_dsum('x', 's', scale)} FROM {{df}}", df=df
    )


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_spark_sql_dsum_matches_column_form_and_raises(spark, ansi):
    """round-12 ADVICE: the spark.sql-statement flagship must carry
    the SAME guard contract as the Column form. Pin all three legs on
    the SQL fragment itself: (1) below the bound it equals dsum
    bit-for-bit, (2) a synthetic accumulator crossing raises in both
    ANSI modes, (3) NaN raises instead of flooring to 0."""
    with _with_ansi(spark, ansi):
        df = spark.range(5).select((F.col("id") * 1.37 + 0.01).alias("x"))
        [via_sql] = _sql_dsum_agg(spark, df).collect()
        [via_col] = df.agg(dsum("x", "s")).collect()
        assert via_sql.s == via_col.s
        over = spark.range(3).select(F.lit(4.0e16).alias("x"))
        with pytest.raises(Exception, match="long-units overflow"):
            _sql_dsum_agg(spark, over).collect()
        nan = spark.range(2).select(
            F.when(F.col("id") == 0, float("nan")).otherwise(1.5).alias("x")
        )
        with pytest.raises(Exception, match="long-units overflow"):
            _sql_dsum_agg(spark, nan).collect()


@pytest.mark.parametrize("ansi", ["true", "false"])
def test_nan_input_raises_loudly(spark, ansi):
    """NaN violates the dsum contract (fixed-point-valued column) and
    must stay LOUD: abs(NaN) >= thr is false, and the floor-based
    units extraction would otherwise turn NaN into a silent 0 where
    the old ROUND path threw from BigDecimal.valueOf(NaN)."""
    df = spark.range(2).select(
        F.when(F.col("id") == 0, float("nan")).otherwise(1.5).alias("x")
    )
    with _with_ansi(spark, ansi):
        with pytest.raises(Exception, match="long-units overflow"):
            df.agg(dsum("x", "s")).collect()
