"""Oracle-checked ML evaluation queries (SURVEY §2.5 W9/W10, §2.10
ML13/ML14): ranking metrics (precision/recall/NDCG@k) for several
scorers against a conversion label, and the feedback→training-data
as-of label join.

Float parity: positional-discount sums are rounded per-row to 9 dp and
decimal-accumulated (different engines would otherwise sum doubles in
different orders); see plans/_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.bronze import load_table
from .registry import register

_KS = (5, 10, 20)

# scorer name -> SQL ORDER BY key over the labels CTE
_SCORERS_SQL = {
    "balance": "c_acctbal DESC, c_custkey",
    "spend": "total_spend DESC, c_custkey",
    "recency": "days_since_order ASC, c_custkey",
}

_LABELS_SQL = """
  labels AS (
    SELECT c.c_custkey,
           c.c_acctbal,
           COALESCE(a.total_spend, 0.0) AS total_spend,
           COALESCE(CAST(DATEDIFF('day', a.last_order_day, DATE '2001-09-01') AS INTEGER), 365)
             AS days_since_order,
           COALESCE(l.rel, 0) AS rel
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(23,2))) AS DOUBLE) AS total_spend,
             MAX(CAST(o_orderdate AS DATE)) AS last_order_day
      FROM orders GROUP BY o_custkey
    ) a ON c.c_custkey = a.o_custkey
    LEFT JOIN (
      SELECT o_custkey, MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS rel
      FROM orders GROUP BY o_custkey
    ) l ON c.c_custkey = l.o_custkey
  )
"""


def _metrics_sql(scorer: str, order_by: str) -> str:
    per_k = []
    for k in _KS:
        per_k.append(
            f"""
    SELECT '{scorer}' AS scorer, {k} AS k,
      CAST(SUM(CASE WHEN pos <= {k} THEN rel END) AS DOUBLE) / {k} AS precision_at_k,
      CAST(SUM(CASE WHEN pos <= {k} THEN rel END) AS DOUBLE)
        / GREATEST(SUM(rel), 1) AS recall_at_k,
      ROUND(
        CAST(SUM(CASE WHEN pos <= {k}
                 THEN CAST(ROUND(rel / LOG2(pos + 1), 9) AS DECIMAL(27,12)) END) AS DOUBLE)
        / CAST(SUM(CASE WHEN ideal_pos <= {k}
                 THEN CAST(ROUND(rel / LOG2(ideal_pos + 1), 9) AS DECIMAL(27,12)) END) AS DOUBLE),
        9) AS ndcg_at_k
    FROM ranked_{scorer}"""
        )
    ranked = f"""
  ranked_{scorer} AS (
    SELECT rel,
           ROW_NUMBER() OVER (ORDER BY {order_by}) AS pos,
           ROW_NUMBER() OVER (ORDER BY rel DESC, c_custkey) AS ideal_pos
    FROM labels
  )"""
    return ranked, " UNION ALL ".join(per_k)


def _ranking_oracle() -> str:
    ranked_ctes = []
    selects = []
    for scorer, order_by in _SCORERS_SQL.items():
        cte, sel = _metrics_sql(scorer, order_by)
        ranked_ctes.append(cte)
        selects.append(sel)
    return "WITH " + _LABELS_SQL + "," + ",".join(ranked_ctes) + " " + " UNION ALL ".join(selects)


@register("ranking_eval_metrics", oracle=_ranking_oracle(), tags=("ml", "W9", "W10", "ML13"))
def ranking_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/NDCG@{5,10,20} for three scorers (balance /
    spend / recency) against the fulfilled-order label — the
    evaluate.py metric table (README.md:82-96 shape) computed with
    window expressions, no collect."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    act = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(23,2)")).cast("double").alias("total_spend"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order_day"),
    )
    rel = o.groupBy("o_custkey").agg(
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("rel")
    ).withColumnRenamed("o_custkey", "rel_custkey")
    labels = (
        c.join(act, c.c_custkey == act.o_custkey, "left")
        .join(rel, c.c_custkey == F.col("rel_custkey"), "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            F.coalesce(
                F.datediff(F.lit("2001-09-01").cast("date"), F.col("last_order_day")),
                F.lit(365),
            ).alias("days_since_order"),
            F.coalesce("rel", F.lit(0)).alias("rel"),
        )
    )

    orders_by = {
        "balance": [F.desc("c_acctbal"), F.asc("c_custkey")],
        "spend": [F.desc("total_spend"), F.asc("c_custkey")],
        "recency": [F.asc("days_since_order"), F.asc("c_custkey")],
    }

    def disc(rel_col: Column, pos_col: Column) -> Column:
        return F.round(rel_col / F.log2(pos_col + 1), 9).cast("decimal(27,12)")

    # ONE pass for all scorers AND all ks: every scorer's position is
    # a window over the SAME labels frame (4 global sorts of one
    # narrow (rel, keys) projection in a single pipeline), every
    # (scorer, k) metric is a conditional sum in ONE aggregate, and
    # stack() reshapes the 1×27 row to the 9 output rows. The
    # agg-per-(scorer,k)-then-union form re-ran the labels join
    # pipeline 9 times (24 parquet scans in the audited plan — the
    # er_threshold_sweep lesson applied here).
    wi = Window.orderBy(F.desc("rel"), F.asc("c_custkey"))
    ranked = labels.select(
        "rel",
        *[
            F.row_number().over(Window.orderBy(*order)).alias(f"pos_{s}")
            for s, order in orders_by.items()
        ],
        F.row_number().over(wi).alias("ideal_pos"),
    )
    aggs = []
    items = []
    for s in orders_by:
        pos = F.col(f"pos_{s}")
        for k in _KS:
            aggs += [
                (F.sum(F.when(pos <= k, F.col("rel"))).cast("double") / k).alias(
                    f"_p_{s}_{k}"
                ),
                (
                    F.sum(F.when(pos <= k, F.col("rel"))).cast("double")
                    / F.greatest(F.sum("rel"), F.lit(1))
                ).alias(f"_r_{s}_{k}"),
                F.round(
                    F.sum(
                        F.when(pos <= k, disc(F.col("rel"), pos))
                    ).cast("double")
                    / F.sum(
                        F.when(
                            F.col("ideal_pos") <= k,
                            disc(F.col("rel"), F.col("ideal_pos")),
                        )
                    ).cast("double"),
                    9,
                ).alias(f"_n_{s}_{k}"),
            ]
            items.append(f"'{s}', {k}, _p_{s}_{k}, _r_{s}_{k}, _n_{s}_{k}")
    return ranked.agg(*aggs).selectExpr(
        f"stack({len(items)}, {', '.join(items)})"
        " AS (scorer, k, precision_at_k, recall_at_k, ndcg_at_k)"
    )


@register(
    "feedback_asof_labels",
    oracle="""
    WITH views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT v.event_id AS view_event_id,
           v.user_id,
           v.ts AS view_ts,
           CAST(MAX(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS INTEGER) AS converted,
           COUNT(p.ts) AS n_conversions,
           MIN((epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0) AS min_delay_sec
    FROM views v
    LEFT JOIN purch p
      ON p.user_id = v.user_id
      AND p.ts > v.ts
      AND p.ts <= v.ts + INTERVAL 24 HOUR
    GROUP BY v.event_id, v.user_id, v.ts
    """,
    tags=("ml", "ML14", "join", "interval"),
)
def feedback_asof_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feedback → training-label generation (feedback_logging.py:
    403-456): each 'view' (prediction analogue) is labeled positive if
    the same user 'purchases' within 24 h — an interval/as-of join the
    reference lacks entirely (SURVEY §2.3 'not present'). Equi-join on
    user_id carries the range predicate, so it shuffles once on the
    user key."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    joined = views.join(
        purch,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") > F.col("view_ts"))
        & (F.col("p_ts") <= F.col("view_ts") + F.expr("INTERVAL 24 HOURS")),
        "left",
    )
    delay = (
        F.unix_micros(F.col("p_ts").cast("timestamp"))
        - F.unix_micros(F.col("view_ts").cast("timestamp"))
    ) / 1_000_000.0
    return joined.groupBy("view_event_id", "user_id", "view_ts").agg(
        F.max(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)).alias("converted"),
        F.count("p_ts").alias("n_conversions"),
        F.min(delay).alias("min_delay_sec"),
    )
