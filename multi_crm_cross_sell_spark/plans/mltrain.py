"""ML training-path queries (SURVEY §2.10 ML1-ML8, ML11-ML12, ML17).

The reference's training core is the 4-member ensemble
(/root/reference/src/ml/pipeline.py:200-290) and the ER RandomForest
trainer (/root/reference/src/ml/entity_resolution.py:493-552). Both
are exercised end-to-end here as ONE registered query so the driver's
correctness signal covers the fit→transform path, not just pytest.

Rows-only by design: MLlib model scores are engine-specific (no SQL
oracle can reproduce LBFGS/GBT training), so the stable surface is the
summary schema and row count — one row per ensemble member, one for
the weighted vote, one for the ER matcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.bronze import load_table
from .registry import register


def _u(tag: str, col):
    """Deterministic uniform in [0,1) from md5 — same construction as
    sources/fixtures.py, so training data is identical across runs."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 1_000_000
    ) / 1_000_000.0


@register(
    "ml_training_scores",
    oracle=None,  # model fitting is not SQL-expressible; rows-only
    tags=("ml", "ML1", "ML3", "ML7", "ML8", "ML11", "training"),
)
def ml_training_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the 4-member ensemble (pipeline.py:200-290) on planted-signal
    pair features derived deterministically from customer keys, batch-
    transform a held-out split, and fit the ER RandomForest matcher
    (entity_resolution.py:493-552) on blocked fixture pairs. Returns
    one summary row per member / vote / matcher, plus an
    'ensemble_reloaded' row (ML17) whose mean_score must equal the
    'score' row's — save→load→rescore round-trip: (model, train_rows,
    scored_rows, mean_score). Small fixed training sizes keep the
    query interactive; the transform path is the same single-pass
    DataFrame inference that scales to the full pair table."""
    from ..ml.ensemble import PAIR_FEATURES, EnsembleScorer
    from ..ml.entity_resolution import (
        candidate_pairs,
        pair_features,
        train_er_model,
    )
    from ..sources import fixtures

    # --- ensemble on planted-signal features over customer keys ---
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"))
        .orderBy("id")
        .limit(1000)
    )
    feats = cust.select(
        "id",
        *[_u(f"f{i}", F.col("id")).alias(name) for i, name in enumerate(PAIR_FEATURES)],
    )
    feats = feats.withColumn(
        "label",
        (
            (
                F.col("industry_match")
                + F.col("size_compatibility")
                + F.col("activity_score")
            )
            > 1.5
        ).cast("int"),
    )
    train = feats.where(F.col("id") % 5 != 0).cache()
    test = feats.where(F.col("id") % 5 == 0).cache()
    scorer = EnsembleScorer(nn_iters=15, rf_trees=20, gb_iters=10)
    model = scorer.fit(train)
    scored = model.transform(test)
    # both split sizes from ONE aggregation pass over the parent frame
    # (two .count() actions would scan twice for two scalars)
    split_row = feats.agg(
        F.count("*").alias("n_all"),
        F.sum((F.col("id") % 5 == 0).cast("bigint")).alias("n_test"),
    ).collect()[0]
    test_n = int(split_row["n_test"])
    train_n = int(split_row["n_all"]) - test_n
    member_cols = [f"score_{m}" for m in model.members] + ["score"]
    agg = scored.agg(
        *[F.round(F.avg(c), 6).alias(c) for c in member_cols]
    )
    stack_expr = ", ".join(f"'{c}', {c}" for c in member_cols)
    ens_rows = agg.select(
        F.expr(f"stack({len(member_cols)}, {stack_expr})").alias("model", "mean_score")
    ).select(
        "model",
        F.lit(train_n).alias("train_rows"),
        F.lit(test_n).alias("scored_rows"),
        "mean_score",
    )

    # --- ML17 persistence: save → load → rescore the same split. The
    # 'ensemble_reloaded' row must equal the 'score' row's mean_score —
    # a driver-visible round-trip check (reference reloads its pickled
    # ensemble at orchestrator.py:356-373). Scalar collected eagerly so
    # the model directory can be cleaned up before returning.
    import tempfile

    with tempfile.TemporaryDirectory(prefix="ensemble_ml17_") as tmp:
        model.save(f"{tmp}/model")
        from ..ml.ensemble import EnsembleModel

        reloaded = EnsembleModel.load(f"{tmp}/model")
        reloaded_mean = (
            reloaded.transform(test)
            .agg(F.round(F.avg("score"), 6).alias("m"))
            .collect()[0]["m"]
        )
    reload_row = spark.createDataFrame(
        [("ensemble_reloaded", train_n, test_n, float(reloaded_mean))],
        "model string, train_rows bigint, scored_rows bigint, mean_score double",
    )
    ens_rows = ens_rows.unionByName(reload_row)

    # --- ER RandomForest matcher on blocked fixture pairs (ML11) ---
    acc = fixtures.accounts(spark, n_per_org=120, match_rate=0.15)
    truth = fixtures.er_labeled_pairs(spark, n_per_org=120, match_rate=0.15)
    feat = pair_features(candidate_pairs(acc))
    labeled = feat.join(
        truth,
        (feat.id1 == truth.account1_id) & (feat.id2 == truth.account2_id),
        "left",
    ).withColumn("is_match_label", F.coalesce("is_match", F.lit(0)))
    labeled = labeled.cache()
    er_model = train_er_model(labeled, num_trees=20, max_depth=5)
    er_scored = er_model.transform(labeled)
    er_n = labeled.count()
    er_row = er_scored.agg(F.round(F.avg("ml_score"), 6).alias("mean_score")).select(
        F.lit("er_rf").alias("model"),
        F.lit(er_n).alias("train_rows"),
        F.lit(er_n).alias("scored_rows"),
        "mean_score",
    )

    return ens_rows.unionByName(er_row).orderBy("model")
