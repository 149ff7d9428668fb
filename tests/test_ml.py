"""End-to-end tests for the MLlib layer: entity resolution cascade +
RF matcher, ensemble scorer, ranking evaluation (SURVEY §2.10)."""

from __future__ import annotations


import pytest


from pyspark.sql import functions as F

from multi_crm_cross_sell_spark.ml.ensemble import EnsembleScorer
from multi_crm_cross_sell_spark.ml.entity_resolution import (
    candidate_pairs,
    evaluate_matches,
    match_decisions,
    pair_features,
    rule_score,
    train_er_model,
)
from multi_crm_cross_sell_spark.ml.evaluate import (
    add_baseline_scores,
    coverage,
    ranking_metrics,
)
from multi_crm_cross_sell_spark.sources import fixtures


@pytest.fixture(scope="module")
def acc(spark):
    return fixtures.accounts(spark, n_per_org=120, match_rate=0.15).cache()


@pytest.fixture(scope="module")
def truth(spark):
    return fixtures.er_labeled_pairs(spark, n_per_org=120, match_rate=0.15).cache()


def test_fixture_shapes(spark, acc, truth):
    assert acc.count() == 240
    assert set(acc.select("_org_id").distinct().toPandas()["_org_id"]) == {"org1", "org2"}
    pos = truth.where(F.col("is_match") == 1).count()
    assert pos == 18  # 15% of 120


def test_er_rule_cascade(spark, acc, truth):
    cand = candidate_pairs(acc)
    feat = rule_score(pair_features(cand))
    decided = match_decisions(feat)
    # join ground truth on the candidate pairs
    gt = truth.withColumnRenamed("is_match", "gt_match")
    labeled = decided.join(
        gt,
        (decided.id1 == gt.account1_id) & (decided.id2 == gt.account2_id),
        "left",
    ).withColumn("is_match_label", F.coalesce("gt_match", F.lit(0)))
    ev = (
        evaluate_matches(labeled, thresholds=(0.7, 0.9, 0.95))
        .toPandas()
        .set_index("threshold")
    )
    # blocking must retain most true pairs and the cascade must find them
    found = labeled.where((F.col("is_match_label") == 1) & F.col("is_match")).count()
    total_true_cands = labeled.where(F.col("is_match_label") == 1).count()
    assert total_true_cands >= 10  # blocking recall on 18 planted pairs
    assert found >= 0.7 * total_true_cands
    # every planted variant normalizes to an exact match (score 1.0),
    # so recall holds all the way up the sweep; prefix-sharing
    # negatives cluster around ~0.8 under the reference's JW-heavy
    # blend, so precision is only discriminative at the top
    assert ev.loc[0.95, "recall"] == 1.0
    assert ev.loc[0.95, "precision"] > 0.7


def test_er_ml_model(spark, acc, truth):
    cand = candidate_pairs(acc)
    feat = pair_features(cand)
    labeled = feat.join(
        truth,
        (feat.id1 == truth.account1_id) & (feat.id2 == truth.account2_id),
        "left",
    ).withColumn("is_match_label", F.coalesce("is_match", F.lit(0)))
    model = train_er_model(labeled, num_trees=20, max_depth=5)
    scored = model.transform(labeled)
    pdf = scored.select("is_match_label", "ml_score").toPandas()
    assert pdf["ml_score"].between(0, 1).all()
    # planted matches should score clearly higher on average
    pos = pdf[pdf.is_match_label == 1]["ml_score"].mean()
    neg = pdf[pdf.is_match_label == 0]["ml_score"].mean()
    assert pos > neg + 0.2


def _decide(spark, rows, ml_scores=None, **kwargs):
    """Run pair_features → rule_score → match_decisions on literal pairs."""
    cols = [
        "id1", "id2", "name1", "name2", "website1", "website2",
        "country1", "country2", "industry1", "industry2",
        "employees1", "employees2",
    ]
    df = spark.createDataFrame(rows, cols)
    feat = rule_score(pair_features(df))
    if ml_scores is not None:
        ml = spark.createDataFrame(
            [(r[0], s) for r, s in zip(rows, ml_scores)], ["id1", "ml_score"]
        )
        feat = feat.join(ml, "id1")
        kwargs.setdefault("ml_score_col", "ml_score")
    return {
        r["id1"]: r for r in match_decisions(feat, **kwargs).collect()
    }


def test_cascade_reference_scores(spark):
    """Hand-computed parity with the reference's _compute_score /
    match_pair (entity_resolution.py:352-446)."""
    rows = [
        # exact: roots equal (www. stripped), names normalize equal
        ("a", "x", "Acme Corporation", "Acme Corp",
         "https://www.acme.com", "acme.com", "US", "US", "Tech", "Tech", 100, 100),
        # fuzzy, fully hand-computable: no domains → domain_score 0;
        # names normalize identically → name_score 1.0; same country
        # (0.4) + same industry (0.3) + size_ratio 0.5 (0.3·0.5) →
        # metadata 0.85; total = 0.4·0 + 0.4·1 + 0.2·0.85 = 0.57 < 0.7
        ("b", "y", "Zeta Systems", "Zeta Sys Inc",
         None, None, "US", "US", "Tech", "Tech", 100, 200),
    ]
    got = _decide(spark, rows)
    a = got["a"]
    assert a["is_match"] and a["match_type"] == "exact"
    assert a["match_score"] == 1.0 and a["confidence"] == "high"
    b = got["b"]
    assert b["rule_score"] == pytest.approx(0.57)
    assert not b["is_match"] and b["match_type"] is None


def test_cascade_ml_below_threshold_falls_back_to_rules(spark):
    """The reference's match_pair (entity_resolution.py:417-446) falls
    THROUGH to rule scoring when the ML probability is below
    match_threshold — a weak ML score must not veto a rule match."""
    rows = [
        ("p", "q", "Acme Labs", "Acme Laboratories",
         "acme.com", "www.acme.com", "US", "US", "Tech", "Tech", 500, 500),
    ]
    # sanity: not an exact match (names differ) but rules clear 0.7
    base = _decide(spark, rows)["p"]
    assert base["match_type"] == "fuzzy" and base["rule_score"] >= 0.7

    low_ml = _decide(spark, rows, ml_scores=[0.4])["p"]
    assert low_ml["is_match"], "sub-threshold ML score must not veto rules"
    assert low_ml["match_type"] == "fuzzy"
    assert low_ml["match_score"] == pytest.approx(low_ml["rule_score"])

    high_ml = _decide(spark, rows, ml_scores=[0.85])["p"]
    assert high_ml["is_match"] and high_ml["match_type"] == "ml"
    assert high_ml["match_score"] == pytest.approx(0.85)
    assert high_ml["confidence"] == "medium"


def test_ensemble_scorer(spark, tmp_path):
    # planted-signal pair features: label correlates with feature sum
    n = 400
    df = spark.range(n)
    u = lambda tag: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))), 1, 15),
            16, 10,
        ).cast("bigint") % 1000
    ) / 1000.0
    feats = df.select(
        "id",
        u("f1").alias("industry_match"),
        u("f2").alias("size_compatibility"),
        u("f3").alias("geo_match"),
        u("f4").alias("product_complementarity"),
        u("f5").alias("maturity_alignment"),
        u("f6").alias("activity_score"),
    )
    feats = feats.withColumn(
        "label",
        (
            (F.col("industry_match") + F.col("size_compatibility") + F.col("activity_score"))
            > 1.5
        ).cast("int"),
    )
    train, test = feats.randomSplit([0.7, 0.3], seed=42)
    model = EnsembleScorer(rf_trees=20, gb_iters=5).fit(train)
    scored = model.transform(test)
    pdf = scored.select("label", "score", "score_std").toPandas()
    assert pdf["score"].between(0, 1).all()
    assert (pdf["score_std"] >= 0).all()
    pos = pdf[pdf.label == 1]["score"].mean()
    neg = pdf[pdf.label == 0]["score"].mean()
    assert pos > neg + 0.2  # ensemble learned the planted signal

    # per-row ablation explanations (ML9): signal features must carry
    # more per-row attribution mass than the planted noise features
    from multi_crm_cross_sell_spark.ml.ensemble import per_row_explanations

    # ML17: save -> load -> identical scores on the same test split
    from multi_crm_cross_sell_spark.ml.ensemble import EnsembleModel

    path = str(tmp_path / "ensemble")
    model.save(path)
    reloaded = EnsembleModel.load(path)
    assert set(reloaded.members) == set(model.members)
    r = reloaded.transform(test).select("id", F.col("score").alias("score_r"))
    joined = scored.select("id", "score").join(r, "id").toPandas()
    assert (joined["score"] - joined["score_r"]).abs().max() == 0.0

    expl = per_row_explanations(model, test, id_cols=["id"]).toPandas()
    assert len(expl) == test.count()
    signal = (
        expl["contrib_industry_match"].abs()
        + expl["contrib_size_compatibility"].abs()
        + expl["contrib_activity_score"].abs()
    ).mean()
    noise = (
        expl["contrib_geo_match"].abs()
        + expl["contrib_product_complementarity"].abs()
        + expl["contrib_maturity_alignment"].abs()
    ).mean()
    assert signal > noise


def test_ranking_metrics_exact(spark):
    # 4 relevant of 6; scores rank two relevant on top
    rows = [
        (1.0, 1, "a"), (0.9, 1, "b"), (0.8, 0, "c"),
        (0.7, 1, "d"), (0.6, 0, "e"), (0.5, 1, "f"),
    ]
    df = spark.createDataFrame(rows, ["score", "label", "id"])
    m = ranking_metrics(df, ks=(2, 4), tiebreak_cols=("id",)).toPandas().set_index("k")
    assert m.loc[2, "precision_at_k"] == pytest.approx(1.0)
    assert m.loc[2, "recall_at_k"] == pytest.approx(2 / 4)
    assert m.loc[4, "precision_at_k"] == pytest.approx(3 / 4)
    assert m.loc[4, "ndcg_at_k"] < 1.0
    cov = coverage(df).collect()[0]["coverage"]
    assert cov == pytest.approx(5 / 6)


def test_baselines(spark):
    df = spark.createDataFrame(
        [(0.2, 0.4, 1), (0.9, 0.1, 0), (0.5, 0.5, 1)], ["f1", "f2", "label"]
    )
    out = add_baseline_scores(df, ["f1", "f2"]).toPandas()
    for c in ("score_random", "score_popularity", "score_similarity"):
        assert c in out.columns
    assert out["score_similarity"].between(0, 1).all()


class TestMLlibMinHashLSH:
    """J2's robust-blocking Spark idiom (SURVEY §2.3): MLlib MinHashLSH
    approxSimilarityJoin over token sets, checked for recall against
    the exact token-Jaccard join on the same frame."""

    def test_approx_join_recall(self, spark, sf_dir):
        from pyspark.ml.feature import CountVectorizer, MinHashLSH
        from pyspark.sql import functions as F

        p = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .select(
                "p_partkey",
                F.array_distinct(F.split("p_name", " ")).alias("toks"),
            )
            .where(F.size("toks") >= 1)
        )
        cv = CountVectorizer(
            inputCol="toks", outputCol="features", binary=True, minDF=1.0
        ).fit(p)
        vecs = cv.transform(p)
        lsh = MinHashLSH(
            inputCol="features", outputCol="hashes", numHashTables=8, seed=42
        ).fit(vecs)
        approx = (
            lsh.approxSimilarityJoin(vecs, vecs, 0.3, distCol="jaccard_dist")
            .where(F.col("datasetA.p_partkey") < F.col("datasetB.p_partkey"))
            .select(
                F.col("datasetA.p_partkey").alias("id1"),
                F.col("datasetB.p_partkey").alias("id2"),
            )
        )
        got = {(r.id1, r.id2) for r in approx.collect()}

        a, b = p.alias("a"), p.alias("b")
        jac = F.size(F.array_intersect("a.toks", "b.toks")) / F.size(
            F.array_union("a.toks", "b.toks")
        ).cast("double")
        exact = (
            a.join(b, F.col("a.p_partkey") < F.col("b.p_partkey"))
            .where(jac >= 0.7)
            .select(
                F.col("a.p_partkey").alias("id1"),
                F.col("b.p_partkey").alias("id2"),
            )
        )
        truth = {(r.id1, r.id2) for r in exact.collect()}
        assert truth, "expected some high-jaccard pairs in testdata"
        # approx join at distance<=0.3 (jaccard>=0.7) must recover the
        # bulk of the exact pairs (probabilistic: 8 tables, seed fixed)
        recall = len(got & truth) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} pairs"
