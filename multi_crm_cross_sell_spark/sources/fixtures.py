"""Seeded CRM-shaped fixture generator (FIXTURES.md tables 1-9).

Mirrors the reference's synthetic generators
(/root/reference/scripts/evaluate.py:101-196,
src/ml/entity_resolution.py:616-708,
scripts/generate_sample_data.py:21-115) as distributed spark.range
plans. Randomness is NOT rand(seed) — that depends on partitioning —
but md5-hash-derived uniforms keyed by row id, so any cluster layout
produces identical fixtures (same reproducibility story as the
dedup/minhash hash family).

Matching org2 accounts are name/domain VARIANTS of org1 masters drawn
from the reference's variant menu (entity_resolution.py:639-649):
exact, " Inc" suffix, Corporation→Corp, "www." domain prefix,
uppercase, hyphenated; employees differ by U(-100,100)
(entity_resolution.py:678).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

AS_OF_TS = "2024-01-01 00:00:00"

_ADJ = ("Global", "Advanced", "United", "Pacific", "Northern", "Quantum", "Prime", "Summit")
_NOUN = ("Logistics", "Dynamics", "Manufacturing", "Analytics", "Systems", "Industries", "Networks", "Materials")
_SUFFIX = ("Inc", "Corporation", "LLC", "Ltd", "Group")
_INDUSTRY = ("Technology", "Finance", "Healthcare", "Retail", "Manufacturing")
_COUNTRY = ("USA", "UK", "Germany", "France", "Canada")
_TYPE = ("Customer", "Prospect", "Partner")
_STAGE = ("Prospecting", "Qualification", "Proposal", "Negotiation", "Closed Won")


def _u(tag: str, col: Column) -> Column:
    """Deterministic uniform [0,1) from md5(tag || id) — partitioning-
    independent, unlike rand(seed)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(tag), col.cast("string"))), 1, 15), 16, 10
    ).cast("bigint")
    return (h % 1_000_000) / 1_000_000.0


def _pick(tag: str, col: Column, options: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    idx = (F.floor(_u(tag, col) * len(options)) + 1).cast("int")
    return F.element_at(arr, idx)


def master_companies(spark: SparkSession, n: int) -> DataFrame:
    """Master company pool both orgs draw from."""
    df = spark.range(n).withColumnRenamed("id", "cid")
    c = F.col("cid")
    name = F.concat_ws(
        " ", _pick("adj", c, _ADJ), _pick("noun", c, _NOUN), _pick("suf", c, _SUFFIX)
    )
    domain = F.concat(
        F.lower(_pick("adj", c, _ADJ)), F.lower(_pick("noun", c, _NOUN)),
        c.cast("string"), F.lit(".com"),
    )
    return df.select(
        "cid",
        name.alias("base_name"),
        domain.alias("base_domain"),
        _pick("ind", c, _INDUSTRY).alias("Industry"),
        _pick("cty", c, _COUNTRY).alias("BillingCountry"),
        _pick("typ", c, _TYPE).alias("Type"),
        F.exp(F.lit(15.0) + F.lit(1.5) * (_u("rev", c) * 2 - 1)).alias("AnnualRevenue"),
        (F.exp(F.lit(5.0) + F.lit(1.5) * (_u("emp", c) * 2 - 1))).cast("long").alias(
            "NumberOfEmployees"
        ),
        (
            F.lit("2020-01-01").cast("date")
            + F.make_interval(days=F.floor(_u("cre", c) * 1000).cast("int"))
        ).cast("timestamp_ntz").alias("CreatedDate"),
        (
            F.lit(AS_OF_TS).cast("timestamp_ntz")
            - F.make_interval(days=F.floor(_u("act", c) * 365).cast("int"))
        ).alias("LastActivityDate"),
    )


def _variant_name(name: Column, v: Column) -> Column:
    """Reference variant menu (entity_resolution.py:639-649)."""
    return (
        F.when(v == 0, name)
        .when(v == 1, F.concat(name, F.lit(" Inc")))
        .when(v == 2, F.regexp_replace(name, "Corporation", "Corp"))
        .when(v == 3, F.upper(name))
        .otherwise(F.regexp_replace(name, " ", "-"))
    )


def accounts(
    spark: SparkSession,
    n_per_org: int = 200,
    match_rate: float = 0.15,
) -> DataFrame:
    """Two-org account table with lineage columns; the first
    ``match_rate`` share of org2 rows are variants of org1 masters."""
    n_match = int(n_per_org * match_rate)
    m = master_companies(spark, n_per_org * 2 - n_match)
    c = F.col("cid")

    org1 = m.where(c < n_per_org).select(
        F.concat(F.lit("ACC1_"), F.format_string("%04d", c)).alias("Id"),
        F.col("base_name").alias("Name"),
        F.col("base_domain").alias("Website"),
        "Industry", "BillingCountry", "Type", "AnnualRevenue", "NumberOfEmployees",
        "CreatedDate", "LastActivityDate",
        F.lit("org1").alias("_org_id"), F.lit("Acme CRM").alias("_org_name"),
    )

    dup = m.where(c < n_match)
    v = (F.floor(_u("var", c) * 5)).cast("int")
    dup2 = dup.select(
        F.concat(F.lit("ACC2_"), F.format_string("%04d", c)).alias("Id"),
        _variant_name(F.col("base_name"), v).alias("Name"),
        F.when(_u("wdom", c) < 0.5, F.concat(F.lit("www."), F.col("base_domain")))
        .otherwise(F.col("base_domain")).alias("Website"),
        "Industry", "BillingCountry", "Type",
        (F.col("AnnualRevenue") * (F.lit(0.9) + _u("rj", c) * 0.2)).alias("AnnualRevenue"),
        (
            F.col("NumberOfEmployees") + (F.floor(_u("ej", c) * 200) - 100).cast("long")
        ).alias("NumberOfEmployees"),
        "CreatedDate", "LastActivityDate",
        F.lit("org2").alias("_org_id"), F.lit("Beta CRM").alias("_org_name"),
    )
    rest = m.where(c >= n_per_org).select(
        F.concat(F.lit("ACC2_"), F.format_string("%04d", c - n_per_org + n_match)).alias("Id"),
        F.col("base_name").alias("Name"),
        F.col("base_domain").alias("Website"),
        "Industry", "BillingCountry", "Type", "AnnualRevenue", "NumberOfEmployees",
        "CreatedDate", "LastActivityDate",
        F.lit("org2").alias("_org_id"), F.lit("Beta CRM").alias("_org_name"),
    )
    out = org1.unionByName(dup2).unionByName(rest)
    # ~10% null injection on nullable attribute columns (FIXTURES.md §1)
    for col, tag in [("AnnualRevenue", "n1"), ("NumberOfEmployees", "n2"), ("Industry", "n3"), ("BillingCountry", "n4")]:
        out = out.withColumn(
            col, F.when(_u(tag, F.col("Id")) < 0.1, F.lit(None)).otherwise(F.col(col))
        )
    return out


def er_labeled_pairs(spark: SparkSession, n_per_org: int = 200, match_rate: float = 0.15) -> DataFrame:
    """Ground-truth pairs: the planted variants are positives; an equal
    number of hash-derived non-matching pairs are negatives."""
    n_match = int(n_per_org * match_rate)
    pos = spark.range(n_match).select(
        F.concat(F.lit("ACC1_"), F.format_string("%04d", F.col("id"))).alias("account1_id"),
        F.concat(F.lit("ACC2_"), F.format_string("%04d", F.col("id"))).alias("account2_id"),
        F.lit(1).alias("is_match"),
    )
    neg = spark.range(n_match * 3).select(
        F.concat(
            F.lit("ACC1_"),
            F.format_string("%04d", (F.floor(_u("na", F.col("id")) * n_per_org)).cast("int")),
        ).alias("account1_id"),
        F.concat(
            F.lit("ACC2_"),
            F.format_string(
                "%04d",
                (
                    n_match
                    + F.floor(_u("nb", F.col("id")) * (n_per_org - n_match))
                ).cast("int"),
            ),
        ).alias("account2_id"),
        F.lit(0).alias("is_match"),
    ).dropDuplicates(["account1_id", "account2_id"])
    return pos.unionByName(neg)


def opportunities(spark: SparkSession, accounts_df: DataFrame, per_account: int = 3) -> DataFrame:
    """Opportunities per account (FIXTURES.md §2); an account is a
    positive label if ANY opp IsWon (orchestrator.py:407-414)."""
    ids = accounts_df.select(F.col("Id").alias("AccountId"))
    exploded = ids.select(
        "AccountId", F.explode(F.sequence(F.lit(1), F.lit(per_account))).alias("k")
    )
    key = F.concat(F.col("AccountId"), F.lit("#"), F.col("k"))
    u_amt, u_won, u_stage, u_close = (
        _u("amt", key), _u("won", key), _u("stg", key), _u("cls", key)
    )
    return exploded.select(
        F.concat(F.lit("OPP_"), F.md5(key)).alias("Id"),
        "AccountId",
        F.concat(F.lit("Opportunity "), F.col("k")).alias("Name"),
        F.when(u_amt < 0.1, F.lit(None)).otherwise(F.exp(F.lit(10.0) + u_amt * 2)).alias("Amount"),
        _pick("st", key, _STAGE).alias("StageName"),
        (
            F.lit("2023-01-01").cast("date")
            + F.make_interval(days=F.floor(u_close * 365).cast("int"))
        ).cast("timestamp_ntz").alias("CloseDate"),
        (u_stage * 100).alias("Probability"),
        (u_won < 0.35).alias("IsClosed"),
        (u_won < 0.25).alias("IsWon"),
    )


def contacts(spark: SparkSession, accounts_df: DataFrame, per_account: int = 2) -> DataFrame:
    ids = accounts_df.select(F.col("Id").alias("AccountId"))
    exploded = ids.select(
        "AccountId", F.explode(F.sequence(F.lit(1), F.lit(per_account))).alias("k")
    )
    key = F.concat(F.col("AccountId"), F.lit("@"), F.col("k"))
    return exploded.select(
        F.concat(F.lit("CON_"), F.md5(key)).alias("Id"),
        "AccountId",
        _pick("fn", key, ("Alex", "Sam", "Jordan", "Taylor", "Casey")).alias("FirstName"),
        _pick("ln", key, ("Smith", "Mueller", "Dubois", "Garcia", "Chen")).alias("LastName"),
        _pick("ti", key, ("CEO", "CTO", "VP Sales", "Director", "Manager")).alias("Title"),
        F.concat(F.lit("user"), F.col("k"), F.lit("@example.com")).alias("Email"),
    )
