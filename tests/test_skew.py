"""Salted-join equivalence: salting must change the shuffle layout,
never the result (SURVEY §4 skew guardrail)."""

from __future__ import annotations


from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.operators.skew import (
    SALT_COL,
    salt_probe,
    salted_join,
)


def _skewed_frames(spark):
    # 90% of probe rows share key 0 (the whale)
    probe = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    build = spark.range(0, 50).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"),
    )
    return probe, build


def test_salted_inner_equals_plain(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_join(probe, build, ["k"], replication=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_left_keeps_unmatched(spark):
    probe, build = _skewed_frames(spark)
    dropped = build.where(F.col("k") != 0)  # whale key has no dim row
    plain = probe.join(dropped, "k", "left")
    salted = salted_join(probe, dropped, ["k"], how="left", replication=8)
    assert plain.count() == salted.count()
    assert (
        salted.where(F.col("k") == 0).where(F.col("name").isNotNull()).count() == 0
    )


def test_salt_distributes_hot_key(spark):
    probe, _ = _skewed_frames(spark)
    salts = (
        salt_probe(probe, replication=8)
        .where(F.col("k") == 0)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert salts == 8, "hot key must scatter across all salt values"
