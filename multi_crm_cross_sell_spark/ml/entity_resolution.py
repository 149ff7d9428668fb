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

# Score-blend weights (EntityResolver.__init__, entity_resolution.py:268-278).
DOMAIN_WEIGHT = 0.4
NAME_WEIGHT = 0.4
METADATA_WEIGHT = 0.2
MATCH_THRESHOLD = 0.7  # entity_resolution.py:273

# ML feature vector = the reference's features dict in insertion order
# (_extract_features, entity_resolution.py:298-350) — the RF sees the
# same 9 features the reference's does.
ER_FEATURES = [
    "domain_exact_match",
    "domain_similarity",
    "name_exact_match",
    "name_jaro_winkler",
    "name_levenshtein",
    "name_jaccard",
    "same_country",
    "same_industry",
    "size_ratio",
]


def blocking_key(name_col, country_col):
    """First-3 chars of the normalized name + '_' + 3-char lowercased
    country prefix (_create_blocking_key, entity_resolution.py:287-294).
    Deliberate deviation: a NULL country coalesces to '' here, whereas
    the reference's str() of a missing pandas value yields the literal
    'nan' (key suffix 'nan') — an artifact of pandas stringification,
    not a semantic choice. Accounts with null BillingCountry therefore
    land in a ''-suffixed block instead of a 'nan'-suffixed one; both
    conventions group all-null-country rows together, so match results
    only differ if real countries collide with the literal 'nan'.
    At 100 TB this key is skewed (common prefixes); AQE skew-join plus
    optional salting handles it — the MinHashLSH variant in
    operators/dedup.py is the robust path."""
    norm = normalize_company_name(name_col)
    return F.concat_ws(
        "_",
        F.substring(norm, 1, 3),
        F.lower(F.substring(F.coalesce(country_col, F.lit("")), 1, 3)),
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
        F.col("Industry").alias("industry"),
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
        F.col("a.industry").alias("industry1"),
        F.col("b.industry").alias("industry2"),
        F.col("a.employees").alias("employees1"),
        F.col("b.employees").alias("employees2"),
    )


def pair_features(pairs: DataFrame) -> DataFrame:
    """ER pair features, the reference's _extract_features verbatim
    (entity_resolution.py:298-350):
    - domain_exact_match = ROOT domains equal, both present (305-315);
      domain_similarity = Jaro-Winkler of the FULL domains, 0.0 when
      either side has no domain
    - name features on NORMALIZED names (317-330): exact flag, JW,
      Levenshtein, token Jaccard over >2-char tokens
    - same_country / same_industry: both present & equal → 1.0 (332-340)
    - size_ratio: min/max of employee counts, 0.5 when unknown (343-348)."""
    n1 = normalize_company_name(F.col("name1"))
    n2 = normalize_company_name(F.col("name2"))
    h1 = domain_from_url(F.col("website1"))
    h2 = domain_from_url(F.col("website2"))
    both_domains = h1.isNotNull() & h2.isNotNull()
    e1 = F.col("employees1").cast("double")
    e2 = F.col("employees2").cast("double")
    size = (
        F.when(
            e1.isNull() | e2.isNull() | (e1 <= 0) | (e2 <= 0), 0.5
        ).otherwise(F.least(e1, e2) / F.greatest(e1, e2))
    )
    # Bind hosts/normalized names in their own projection so the
    # parse_url / normalization chains run once per pair, not once per
    # downstream reference (see SKILL.md perf note on HOF re-eval).
    bound = pairs.select(
        "*",
        # Coalesce to '': a NULL Name would otherwise propagate NULL
        # through JW/Levenshtein into the feature vector (reference
        # treats missing as empty → similarity 0.0).
        F.coalesce(n1, F.lit("")).alias("norm_name1"),
        F.coalesce(n2, F.lit("")).alias("norm_name2"),
        h1.alias("host1"),
        h2.alias("host2"),
    )
    return bound.select(
        "*",
        (
            F.when(
                both_domains
                & (root_domain(F.col("host1")) == root_domain(F.col("host2"))),
                1.0,
            ).otherwise(0.0)
        ).alias("domain_exact_match"),
        F.when(both_domains, jaro_winkler(F.col("host1"), F.col("host2")))
        .otherwise(0.0)
        .alias("domain_similarity"),
        (F.col("norm_name1") == F.col("norm_name2"))
        .cast("double")
        .alias("name_exact_match"),
        jaro_winkler(F.col("norm_name1"), F.col("norm_name2")).alias(
            "name_jaro_winkler"
        ),
        levenshtein_similarity(F.col("norm_name1"), F.col("norm_name2")).alias(
            "name_levenshtein"
        ),
        jaccard_tokens(name_tokens(F.col("name1")), name_tokens(F.col("name2"))).alias(
            "name_jaccard"
        ),
        (
            F.when(
                F.col("country1").isNotNull()
                & (F.col("country1") == F.col("country2"))
                & (F.col("country1") != ""),
                1.0,
            ).otherwise(0.0)
        ).alias("same_country"),
        (
            F.when(
                F.col("industry1").isNotNull()
                & (F.col("industry1") == F.col("industry2"))
                & (F.col("industry1") != ""),
                1.0,
            ).otherwise(0.0)
        ).alias("same_industry"),
        size.alias("size_ratio"),
    )


def rule_score(feat: DataFrame) -> DataFrame:
    """Nested rule score, the reference's _compute_score verbatim
    (entity_resolution.py:352-396):
    - domain_score: 1.0 on exact root-domain match, else the JW domain
      similarity
    - name_score: 1.0 on exact normalized-name match, else
      max(jaro_winkler, jaccard, levenshtein)
    - metadata_score: 0.4·country + 0.3·industry + 0.3·size_ratio
    blended 0.4·domain + 0.4·name + 0.2·metadata."""
    domain_score = F.when(F.col("domain_exact_match") > 0, 1.0).otherwise(
        F.col("domain_similarity")
    )
    name_score = F.when(F.col("name_exact_match") > 0, 1.0).otherwise(
        F.greatest(
            F.col("name_jaro_winkler"),
            F.col("name_jaccard"),
            F.col("name_levenshtein"),
        )
    )
    metadata_score = (
        0.4 * F.col("same_country")
        + 0.3 * F.col("same_industry")
        + 0.3 * F.col("size_ratio")
    )
    score = (
        DOMAIN_WEIGHT * domain_score
        + NAME_WEIGHT * name_score
        + METADATA_WEIGHT * metadata_score
    )
    return feat.withColumn("rule_score", score)


def match_decisions(
    scored: DataFrame,
    threshold: float = MATCH_THRESHOLD,
    ml_score_col: str | None = None,
    ml_threshold: float | None = None,
) -> DataFrame:
    """Decision cascade, the reference's match_pair verbatim
    (entity_resolution.py:398-446): exact (root-domain ∧
    normalized-name) short-circuits at score 1.0; else an ML
    probability ≥ match_threshold wins; else — including when the ML
    score is BELOW its threshold — the weighted rule score decides.
    The ML stage gates on the same match_threshold as the rule stage
    unless overridden, and a sub-threshold ML score falls THROUGH to
    rules rather than vetoing the pair.

    Emits match_type ('exact'/'ml'/'fuzzy', null for non-matches),
    confidence (match_pair's high/medium/low ladders) and the
    _compute_score reasons as a filtered array of flags."""
    if ml_threshold is None:
        ml_threshold = threshold
    exact = (F.col("domain_exact_match") > 0) & (F.col("name_exact_match") > 0)
    ml_hit = (
        F.col(ml_score_col).isNotNull() & (F.col(ml_score_col) >= ml_threshold)
        if ml_score_col
        else F.lit(False)
    )
    rule_hit = F.col("rule_score") >= threshold
    is_match = exact | ml_hit | rule_hit
    match_score = (
        F.when(exact, F.lit(1.0))
        .when(ml_hit, F.col(ml_score_col).cast("double") if ml_score_col else F.lit(None))
        .otherwise(F.col("rule_score"))
    )
    match_type = (
        F.when(exact, F.lit("exact"))
        .when(ml_hit, F.lit("ml"))
        .when(rule_hit, F.lit("fuzzy"))
        .otherwise(F.lit(None).cast("string"))
    )
    confidence = (
        F.when(exact, F.lit("high"))
        .when(ml_hit, F.when(match_score > 0.9, "high").otherwise("medium"))
        .when(
            rule_hit,
            F.when(match_score > 0.9, "high")
            .when(match_score > 0.8, "medium")
            .otherwise("low"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    reasons = F.filter(
        F.array(
            F.when(exact, F.lit("exact_domain_and_name")),
            F.when(F.col("domain_exact_match") > 0, F.lit("exact_domain")),
            F.when(F.col("name_exact_match") > 0, F.lit("exact_name")),
            F.when(
                (F.col("name_exact_match") <= 0)
                & (
                    F.greatest(
                        F.col("name_jaro_winkler"),
                        F.col("name_jaccard"),
                        F.col("name_levenshtein"),
                    )
                    > 0.8
                ),
                F.lit("similar_name"),
            ),
            F.when(F.col("same_country") > 0, F.lit("same_country")),
            F.when(F.col("same_industry") > 0, F.lit("same_industry")),
        ),
        lambda x: x.isNotNull(),
    )
    return scored.select(
        "*",
        is_match.alias("is_match"),
        match_score.alias("match_score"),
        match_type.alias("match_type"),
        confidence.alias("confidence"),
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
    evaluate_entity_resolution.py:78-118) as ONE aggregation pass:
    every threshold's tp/fp/fn is a conditional count in the same agg,
    then `stack` pivots the wide row into one row per threshold. The
    input pipeline (blocked join, string kernels) therefore executes
    once, not once per threshold — the round-3 shape (per-threshold
    aggs unioned) re-scanned the pair frame len(thresholds) times."""
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("match_score") >= t
        aggs.append(F.count(F.when(pred & (F.col(label_col) == 1), 1)).alias(f"tp{i}"))
        aggs.append(F.count(F.when(pred & (F.col(label_col) == 0), 1)).alias(f"fp{i}"))
        aggs.append(
            F.count(F.when(~pred & (F.col(label_col) == 1), 1)).alias(f"fn{i}")
        )
    wide = decided.agg(*aggs)
    stacked = ", ".join(
        f"CAST({t!r} AS DOUBLE), tp{i}, fp{i}, fn{i}" for i, t in enumerate(thresholds)
    )
    out = wide.selectExpr(
        f"stack({len(thresholds)}, {stacked}) AS (threshold, tp, fp, fn)"
    )
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
