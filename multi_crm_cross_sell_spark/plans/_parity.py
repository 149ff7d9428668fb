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

# Decimal wide enough for sf up to ~100 on these tables.
MONEY = "decimal(23,2)"
FINE = "decimal(27,6)"


def dsum(col: Column | str, alias: str, scale: str = MONEY) -> Column:
    """Exact (decimal-cast) sum of a double column, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(scale)).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str, scale: str = MONEY) -> str:
    return f"CAST(SUM(CAST({expr} AS {scale.upper()})) AS DOUBLE) AS {alias}"


def davg(col: Column | str, alias: str, scale: str = FINE) -> Column:
    """Exact-sum-based average: sum(decimal)→double, divided by count.

    Both engines then divide identical doubles by identical longs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(scale)).cast("double") / F.count(c)).alias(alias)


def sql_davg(expr: str, alias: str, scale: str = FINE) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {scale.upper()})) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


def r9(col: Column, alias: str) -> Column:
    """Round a transcendental-derived double to 9 dp (libm divergence
    between the JVM and DuckDB is ≤1 ulp; 9 dp is ~1e6× above it for
    the magnitudes we emit)."""
    return F.round(col, 9).alias(alias)
