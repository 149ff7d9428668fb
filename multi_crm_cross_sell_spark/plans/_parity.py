"""Float-determinism helpers for oracle-checked queries.

Summing doubles is order-dependent; Spark's partial aggregation and
DuckDB's single-node aggregation visit rows in different orders, so a
raw ``sum(double)`` can differ in the last ulps — enough to flip a
rounded value and break a hash compare. The fix is to make the
aggregation EXACT: cast each row to a decimal before summing (decimal
addition is associative), then cast the exact decimal result back to
double (the cents/micros fit well inside 2^53, so the final double is
identical in both engines).

This also mirrors the scale guidance in SURVEY §1.2: money at 100 TB
belongs in decimals, not doubles.

Per-row arithmetic (+,-,*,/ on doubles) is IEEE-deterministic and needs
no rounding; only cross-row reductions and transcendentals (different
libm implementations) are protected — transcendentals by rounding to 9
significant-ish decimals, far above the ≤1-ulp libm divergence.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal type strings kept as the SEMANTIC declaration (money with 2
# fractional digits, fine quantities with 6); the accumulation itself
# runs in long integer units — see _units.
MONEY = "decimal(23,2)"
FINE = "decimal(27,6)"


def _frac_digits(scale: str) -> int:
    return int(scale.rstrip(")").rsplit(",", 1)[1])


def _units(scale: str) -> int:
    return 10 ** _frac_digits(scale)


# Exactness argument, long-units form: every input is a decimal with
# ≤ f fractional digits, so x·10^f is integer-valued; the nearest
# double to x is within ~1e-10 of that integer, so ROUND(x·10^f) is
# the EXACT integer in both engines regardless of tie rules. Integer
# addition is associative — partial aggregation order cannot change
# the sum — and the final units→value division produces the identical
# double on both sides. Same guarantee as decimal accumulation, at
# long speed: Spark sums decimals wider than 18 digits on the
# BigDecimal path (measured 6.7× slower than the long path on
# pricing_summary, 1.8s → 0.4s at sf0.1).
# Overflow bound: |Σ x·10^f| must stay under 2^63 ≈ 9.2e18 — with
# f=6 that is ~9.2e12 in value units, crossed near sf≈40 on lineitem
# sums. In non-ANSI Spark a crossing would WRAP silently, so the
# guard is spark.sql.ansi.enabled: under ANSI the same long sum
# throws on overflow instead of wrapping, and
# tests/test_parity_guard.py runs the dsum/davg queries under ANSI to
# pin that the bound holds at test scale and that the failure mode at
# production scale is loud. Deployments beyond the bound flip to
# plain double aggregation (SCALE.md) or widen to decimal; the
# long-units path is the test-scale parity anchor.


def dsum(col: Column | str, alias: str, scale: str = MONEY) -> Column:
    """Exact sum of a fixed-point-valued double column, emitted as
    double: accumulate ROUND(x·10^f) as bigint, divide back once."""
    c = F.col(col) if isinstance(col, str) else col
    u = _units(scale)
    return (
        F.sum(F.round(c * u).cast("bigint")).cast("double") / F.lit(float(u))
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: str = MONEY) -> str:
    u = _units(scale)
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {u}) AS BIGINT)) AS DOUBLE)"
        f" / {float(u)} AS {alias}"
    )


def davg(col: Column | str, alias: str, scale: str = FINE) -> Column:
    """Exact-sum-based average: long-units sum→double, divided by the
    unit factor and the count. Both engines divide identical doubles
    by identical longs."""
    c = F.col(col) if isinstance(col, str) else col
    u = _units(scale)
    return (
        F.sum(F.round(c * u).cast("bigint")).cast("double")
        / F.lit(float(u))
        / F.count(c)
    ).alias(alias)


def sql_davg(expr: str, alias: str, scale: str = FINE) -> str:
    u = _units(scale)
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {u}) AS BIGINT)) AS DOUBLE)"
        f" / {float(u)} / COUNT({expr}) AS {alias}"
    )


def r9(col: Column, alias: str) -> Column:
    """Round a transcendental-derived double to 9 dp (libm divergence
    between the JVM and DuckDB is ≤1 ulp; 9 dp is ~1e6× above it for
    the magnitudes we emit)."""
    return F.round(col, 9).alias(alias)
