"""Cross-org entity resolution (SURVEY §2.10 ML10-ML12).

Reference: blocking + fuzzy-string + ML matching
(/root/reference/src/ml/entity_resolution.py): blocking key 287-294,
pair features 298-350, weighted rule score 352-396, decision cascade
398-446, RF trainer 493-552, evaluator 554-613.

Spark re-design: the entire pair pipeline is a DataFrame graph —
blocked candidate join (crm.blocked_similarity_join pattern), feature
projection with the reference's exact weights/sentinels, decision
cascade as when() chains with a reasons array, RF via MLlib. All
set-based; the only Python kernel is the Jaro-Winkler pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.similarity import jaccard_tokens, jaro_winkler, levenshtein_similarity
from ..functions.text import domain_from_url, name_tokens, normalize_company_name, root_domain

# Rule-score weights (entity_resolution.py:268-282).
RULE_WEIGHTS = {
    "name_similarity": 0.4,
    "domain_match": 0.3,
    "geo_match": 0.1,
    "size_similarity": 0.1,
    "token_overlap": 0.1,
}

MATCH_THRESHOLD = 0.7  # entity_resolution.py:273

ER_FEATURES = [
    "name_levenshtein",
    "name_jaro_winkler",
    "token_jaccard",
    "domain_exact",
    "root_domain_match",
    "geo_match",
    "size_similarity",
]


def blocking_key(name_col, country_col):
    """First-3 chars of the normalized name + 2-char country prefix
    (entity_resolution.py:287-294). At 100 TB this key is skewed
    (common prefixes); AQE skew-join plus optional salting handles it —
    the MinHashLSH variant in operators/dedup.py is the robust path."""
    norm = normalize_company_name(name_col)
    return F.concat_ws(
        "|",
        F.substring(norm, 1, 3),
        F.upper(F.substring(F.coalesce(country_col, F.lit("")), 1, 2)),
    )


def candidate_pairs(accounts: DataFrame, max_block: int = 1000) -> DataFrame:
    """Blocked candidate join across orgs (entity_resolution.py:459-478):
    equi-join on the blocking key, cross-org only, deterministic pair
    order. ``max_block`` drops degenerate blocks (skew guard)."""
    base = accounts.select(
        F.col("Id").alias("id"),
        F.col("Name").alias("name"),
        F.col("Website").alias("website"),
        F.col("BillingCountry").alias("country"),
        F.col("NumberOfEmployees").alias("employees"),
        F.col("_org_id").alias("org_id"),
        blocking_key(F.col("Name"), F.col("BillingCountry")).alias("block_key"),
    )
    sizes = base.groupBy("block_key").count().where(F.col("count") <= max_block)
    pruned = base.join(F.broadcast(sizes.select("block_key")), "block_key")
    a, b = pruned.alias("a"), pruned.alias("b")
    return a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.org_id") < F.col("b.org_id")),
    ).select(
        F.col("a.id").alias("id1"),
        F.col("b.id").alias("id2"),
        F.col("a.name").alias("name1"),
        F.col("b.name").alias("name2"),
        F.col("a.website").alias("website1"),
        F.col("b.website").alias("website2"),
        F.col("a.country").alias("country1"),
        F.col("b.country").alias("country2"),
        F.col("a.employees").alias("employees1"),
        F.col("b.employees").alias("employees2"),
    )


def pair_features(pairs: DataFrame) -> DataFrame:
    """ER pair features with the reference's exact semantics:
    - name sims on NORMALIZED names (entity_resolution.py:311-321)
    - domain exact / root-domain match (323-330)
    - geo: both present & equal → 1.0, both present & differ → 0.0,
      any missing → 0.3 (332-340)
    - size: min/max ratio, 0.5 when unknown (343-348)."""
    n1 = normalize_company_name(F.col("name1"))
    n2 = normalize_company_name(F.col("name2"))
    d1 = root_domain(domain_from_url(F.col("website1")))
    d2 = root_domain(domain_from_url(F.col("website2")))
    geo = (
        F.when(F.col("country1").isNull() | F.col("country2").isNull(), 0.3)
        .when(F.col("country1") == F.col("country2"), 1.0)
        .otherwise(0.0)
    )
    e1 = F.col("employees1").cast("double")
    e2 = F.col("employees2").cast("double")
    size = (
        F.when(
            e1.isNull() | e2.isNull() | (e1 <= 0) | (e2 <= 0), 0.5
        ).otherwise(F.least(e1, e2) / F.greatest(e1, e2))
    )
    return pairs.select(
        "*",
        levenshtein_similarity(n1, n2).alias("name_levenshtein"),
        jaro_winkler(n1, n2).alias("name_jaro_winkler"),
        jaccard_tokens(name_tokens(F.col("name1")), name_tokens(F.col("name2"))).alias(
            "token_jaccard"
        ),
        (
            F.when(
                domain_from_url(F.col("website1")).isNotNull()
                & (domain_from_url(F.col("website1")) == domain_from_url(F.col("website2"))),
                1.0,
            ).otherwise(0.0)
        ).alias("domain_exact"),
        F.when(d1.isNotNull() & (d1 == d2), 1.0).otherwise(0.0).alias("root_domain_match"),
        geo.alias("geo_match"),
        size.alias("size_similarity"),
        n1.alias("norm_name1"),
        n2.alias("norm_name2"),
    )


def rule_score(feat: DataFrame) -> DataFrame:
    """Weighted rule score (entity_resolution.py:352-396): name sim =
    max(levenshtein, jaro-winkler) blended per RULE_WEIGHTS."""
    name_sim = F.greatest(F.col("name_levenshtein"), F.col("name_jaro_winkler"))
    score = (
        RULE_WEIGHTS["name_similarity"] * name_sim
        + RULE_WEIGHTS["domain_match"] * F.col("root_domain_match")
        + RULE_WEIGHTS["geo_match"] * F.col("geo_match")
        + RULE_WEIGHTS["size_similarity"] * F.col("size_similarity")
        + RULE_WEIGHTS["token_overlap"] * F.col("token_jaccard")
    )
    return feat.withColumn("rule_score", score)


def match_decisions(
    scored: DataFrame,
    threshold: float = MATCH_THRESHOLD,
    ml_score_col: str | None = None,
    ml_threshold: float = 0.5,
) -> DataFrame:
    """Decision cascade (entity_resolution.py:398-446): exact
    (domain ∧ normalized-name) → ML probability → weighted rules.
    Reasons emitted as a filtered array of when() literals, mirroring
    the reference's reasons list."""
    exact = (F.col("domain_exact") >= 1.0) & (F.col("norm_name1") == F.col("norm_name2"))
    ml = (
        F.col(ml_score_col) >= ml_threshold
        if ml_score_col
        else F.lit(None).cast("boolean")
    )
    rule = F.col("rule_score") >= threshold
    is_match = F.when(exact, True).otherwise(
        F.coalesce(ml, rule)
    )
    match_score = F.when(exact, F.lit(1.0)).otherwise(
        F.coalesce(
            F.col(ml_score_col).cast("double") if ml_score_col else F.lit(None).cast("double"),
            F.col("rule_score"),
        )
    )
    reasons = F.filter(
        F.array(
            F.when(exact, F.lit("exact_domain_and_name")),
            F.when(F.col("name_jaro_winkler") >= 0.9, F.lit("high_name_similarity")),
            F.when(F.col("root_domain_match") >= 1.0, F.lit("domain_match")),
            F.when(F.col("geo_match") >= 1.0, F.lit("same_country")),
            F.when(F.col("token_jaccard") >= 0.5, F.lit("token_overlap")),
        ),
        lambda x: x.isNotNull(),
    )
    return scored.select(
        "*",
        is_match.alias("is_match"),
        match_score.alias("match_score"),
        reasons.alias("match_reasons"),
    )


@dataclass
class ERModel:
    assembler: VectorAssembler
    model: object

    def transform(self, feat: DataFrame) -> DataFrame:
        scored = self.model.transform(self.assembler.transform(feat))
        return scored.withColumn(
            "ml_score", vector_to_array(F.col("probability")).getItem(1)
        ).drop("rawPrediction", "probability", "prediction", "er_features")


def train_er_model(
    labeled_features: DataFrame,
    label_col: str = "is_match_label",
    seed: int = 42,
    num_trees: int = 100,
    max_depth: int = 10,
) -> ERModel:
    """RF matcher on pair features (entity_resolution.py:493-552;
    class_weight=balanced → weightCol of inverse class frequencies)."""
    counts = {
        r[label_col]: r["count"]
        for r in labeled_features.groupBy(label_col).count().collect()
    }
    total = sum(counts.values())
    n_classes = len(counts)
    weights = {k: total / (n_classes * v) for k, v in counts.items()}
    weighted = labeled_features.withColumn(
        "w",
        F.when(F.col(label_col) == 1, F.lit(weights.get(1, 1.0))).otherwise(
            F.lit(weights.get(0, 1.0))
        ),
    )
    assembler = VectorAssembler(inputCols=ER_FEATURES, outputCol="er_features")
    rf = RandomForestClassifier(
        featuresCol="er_features",
        labelCol=label_col,
        weightCol="w",
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    model = rf.fit(assembler.transform(weighted))
    return ERModel(assembler=assembler, model=model)


def evaluate_matches(
    decided: DataFrame, label_col: str = "is_match_label", thresholds: tuple[float, ...] = (0.5, 0.6, 0.7, 0.8, 0.9)
) -> DataFrame:
    """Precision/recall/F1 threshold sweep (entity_resolution.py:554-613;
    evaluate_entity_resolution.py:78-118) as one aggregation per
    threshold, unioned — no driver-side loops over rows."""
    frames = []
    for t in thresholds:
        pred = F.col("match_score") >= t
        agg = decided.agg(
            F.lit(t).alias("threshold"),
            F.count(F.when(pred & (F.col(label_col) == 1), 1)).alias("tp"),
            F.count(F.when(pred & (F.col(label_col) == 0), 1)).alias("fp"),
            F.count(F.when(~pred & (F.col(label_col) == 1), 1)).alias("fn"),
        )
        frames.append(agg)
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    precision = F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))
    recall = F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        precision.alias("precision"),
        recall.alias("recall"),
        (
            2
            * precision
            * recall
            / F.when(precision + recall == 0, F.lit(1.0)).otherwise(precision + recall)
        ).alias("f1"),
    )
