"""Banded-simhash recall/cost curve for ngram_jaccard_dedup.

Round-5's B=8 band count was chosen without measuring the B=4/B=6
points; this tool produces the full curve so the production setting is
a measured choice, not a guess (same discipline as the ANN recall
curves in tools/recall_bench.py and the reference's ER threshold sweep,
/root/reference/scripts/evaluate_entity_resolution.py:78-118).

Ground truth is EXACT: every pair with bigram-set Jaccard >= 0.5,
found with the standard inverted-index algorithm (pairs sharing at
least one gram — a superset of any pair with jaccard > 0 — then exact
|A∩B| / |A∪B| on the gram rows). No sampling, no sketch.

For each B it reports:
- truth pairs / candidate pairs / found pairs / recall
- steady-state wall seconds for the FULL query (min of N after one
  discarded warm run, so Janino/JIT compile noise is excluded)

Usage:
    python tools/ngram_recall.py [sf_dir]        # default sf0.1
Prints one JSON line per B.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from multi_crm_cross_sell_spark.operators.dedup import (  # noqa: E402
    GRAM_K,
    P,
    banded_simhash_bands,
    base_hash,
)
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402
from multi_crm_cross_sell_spark.sources.bronze import load_table  # noqa: E402

THRESHOLD = 0.5


def gram_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_parts = spark.sparkContext.defaultParallelism * 2
    scoped = docs.where(F.size(F.split(F.col("text"), " ")) >= 2)
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    return (
        scoped.repartition(n_parts, F.col("doc_id"))
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .select("doc_id", "pos", base_hash(F.col("word")).alias("h"))
        .withColumn("h2", F.lead("h").over(wnd))
        .where(F.col("h2").isNotNull())
        .select("doc_id", ((F.col("h") * F.lit(GRAM_K) + F.col("h2")) % F.lit(P)).alias("g"))
        .dropDuplicates(["doc_id", "g"])
    )


def exact_truth(grams):
    """All pairs with jaccard >= THRESHOLD via gram-sharing join."""
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("nb"))
    g1 = grams.select(F.col("doc_id").alias("doc1"), "g")
    g2 = grams.select(F.col("doc_id").alias("doc2"), "g")
    inter = (
        g1.join(g2, "g")
        .where(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("ni"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("nb").alias("nb1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("nb").alias("nb2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .where(
            F.col("ni") / (F.col("nb1") + F.col("nb2") - F.col("ni")).cast("double")
            >= THRESHOLD
        )
        .select("doc1", "doc2")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ngram-recall")
    spark.sparkContext.setLogLevel("ERROR")

    grams = gram_rows(spark, sf_dir).cache()
    n_docs = grams.select("doc_id").distinct().count()
    truth = exact_truth(grams).cache()
    n_truth = truth.count()
    print(f"# n_docs={n_docs} truth_pairs={n_truth}", file=sys.stderr)

    from multi_crm_cross_sell_spark.plans.datapipe import _make_ngram_query

    for n_bands in (4, 6, 8):
        bands = banded_simhash_bands(grams, n_docs, n_bands=n_bands)
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (
                    F.least(F.col("a.nb"), F.col("b.nb"))
                    >= THRESHOLD * F.greatest(F.col("a.nb"), F.col("b.nb"))
                ),
            )
            .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
            .dropDuplicates(["doc1", "doc2"])
            .cache()
        )
        n_cand = cand.count()
        n_found = cand.join(truth, ["doc1", "doc2"]).count()
        cand.unpersist()

        # steady-state wall: full query with this band count
        fn = _make_ngram_query(n_bands=n_bands)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        times = []
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_bands": n_bands,
                    "truth": n_truth,
                    "candidates": n_cand,
                    "found": n_found,
                    "recall": round(n_found / n_truth, 4) if n_truth else None,
                    "wall_min": min(times),
                    "wall_all": times,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
