"""OLAP operators beyond the reference's surface (SURVEY §2.4 notes
grouping sets / distinct-agg / approx sketches as absent; §2.3 notes
semi/anti joins as absent). A 100 TB analytics engine needs them, so
they are first-class here, each oracle-checked where exact semantics
allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bronze import load_table
from ._parity import davg, dsum, sql_davg, sql_dsum
from .registry import register


@register(
    "sales_rollup_cube",
    oracle="""
    SELECT COALESCE(r_name, '<all>') AS region,
           COALESCE(o_orderpriority, '<all>') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total_value,
           CAST(GROUPING(r_name) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS grouping_id
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r_name, o_orderpriority)
    """,
    tags=("olap", "cube", "beyond-reference"),
)
def sales_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (region, priority): all four grouping-set combinations
    in one pass (Spark expands to a single shuffle with grouping-id)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        joined.cube("r_name", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "total_value"),
            F.grouping_id("r_name", "o_orderpriority").cast("int").alias("grouping_id"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "n_orders",
            "total_value",
            "grouping_id",
        )
    )


@register(
    "order_priority_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS urgent,
           CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS high,
           CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS medium,
           CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS not_specified,
           CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("olap", "pivot", "F15"),
)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide one-hot aggregation, the table-level analogue of the
    reference's get_dummies F15). Explicit value list so the plan needs
    no extra distinct-discovery job."""
    o = load_table(spark, sf_dir, "orders")
    values = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", values)
        .count()
        .na.fill(0)
    )
    return pivoted.select(
        "o_orderstatus",
        F.col("1-URGENT").alias("urgent"),
        F.col("2-HIGH").alias("high"),
        F.col("3-MEDIUM").alias("medium"),
        F.col("4-NOT SPECIFIED").alias("not_specified"),
        F.col("5-LOW").alias("low"),
    )


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join", "anti", "beyond-reference"),
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — absent from the reference (its 'not matched'
    logic is Python set difference); one shuffle, no row explosion."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
    tags=("join", "semi", "J7"),
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (J7's membership check done as a join, not an
    IN-list collect)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_nationkey"
    )


@register(
    "nation_balance_quantiles",
    oracle="""
    SELECT c_nationkey,
           quantile_cont(c_acctbal, 0.25) AS p25,
           quantile_cont(c_acctbal, 0.5) AS median,
           quantile_cont(c_acctbal, 0.75) AS p75,
           quantile_cont(c_acctbal, 0.95) AS p95
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("olap", "quantiles", "beyond-reference"),
)
def nation_balance_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics). At 100 TB swap for
    approx_percentile (t-digest sketch, approx_distinct_stats below)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.percentile("c_acctbal", 0.25).alias("p25"),
        F.percentile("c_acctbal", 0.5).alias("median"),
        F.percentile("c_acctbal", 0.75).alias("p75"),
        F.percentile("c_acctbal", 0.95).alias("p95"),
    )


@register(
    "approx_distinct_stats",
    oracle=None,  # HLL/t-digest sketches are engine-specific by design
    tags=("olap", "sketch", "approx"),
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregations — the 100 TB versions of COUNT DISTINCT and
    percentile (SURVEY §2.4: coverage at scale uses
    approx_count_distinct). Rows-only check: sketch estimates are
    engine-specific by construction. Percentiles are emitted as scalar
    columns (not array<double>) so the result canonicalizes cleanly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("price_p50"),
        F.approx_percentile("l_extendedprice", 0.95, 10000).alias("price_p95"),
        F.approx_percentile("l_extendedprice", 0.99, 10000).alias("price_p99"),
        F.count("*").alias("exact_rows"),
    )
