"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Queries execute through the noop sink so the full plan (scan → shuffle
→ projection) runs without driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402

# Fixed headline set: keep stable round-over-round so BENCH_r{N}.json
# files are comparable. Names absent from the registry are skipped.
HEADLINE = [
    "pricing_summary",
    "join_revenue_by_nation",
    "topk_per_group",
    "global_rank_topn",
    "label_join",
    "daily_order_stats",
    "customer_order_deltas",
    "cross_sell_recommendations",
    "blocked_similarity_join",
    "exact_dedup_documents",
    "minhash_near_dup",
    "doc_text_stats",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ngram_jaccard_dedup",
    "embedding_near_dup",
    "rolling_hash_fingerprints",
    "token_counting",
    "extractive_summary",
    "er_match_cascade",
    "event_tumbling_windows",
    "event_sessionization",
]

# Second, separately-totaled section (round 7): the curation /
# tokenizer-prep family. Kept OUT of HEADLINE so the 22-query core
# total stays comparable across rounds; this section gets its own
# total in the same JSON line.
CURATION = [
    "benchmark_decontamination",
    "benchmark_decontamination_bloom",
    "unigram_lm_quality",
    "bigram_lm_quality",
    "tfidf_top_terms",
    "corpus_curation_report",
    "dataset_mix_downsample",
    "dataset_split_assignments",
    "sequence_packing",
    "vocab_construction",
    "document_token_ids",
    "document_chunks",
    "textrank_keywords",
    "embedding_int8_quantize",
    "bpe_vocab",
    "document_bpe_ids",
    # --- end of the round-7 curation set: entries above this line
    # are the 16 queries whose sum is r7's curation_total, reported
    # separately as curation_total_r7_subset for round-over-round
    # comparability. Round 8 newcomers below (measured from birth):
    "stratified_sample",
    "dataset_temperature_mix",
    "perplexity_filter_by_lang",
    "length_bucketed_batches",
    "semantic_dedup",
    "dsir_importance_weights",
    "dedup_keep_best",
    "repeated_span_stats",
    "repeated_span_removal",
    "decontamination_span_removal",
    "incremental_neardup_ingest",
    "leakage_safe_splits",
    "cluster_balanced_sample",
    "source_overlap_matrix",
    # Round 9 newcomers, measured from birth:
    "prototypicality_pruning",
    "d4_selection",
]

# Third section (round 9): the ANN INDEX family. ann_lsh_topk has
# always been in HEADLINE, but the ivf/pq/multitable index builds were
# previously unbenched — the catalog's heaviest per-query fixed costs
# were invisible in the recorded JSON (round-8 verdict item). Own
# total, same min-of-N discipline.
ANN_INDEX = [
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_lsh_multitable",
    # round 9 newcomer, measured from birth:
    "ann_rerank_crossencoder",
    # round 10 newcomer (hierarchical two-level IVF), from birth:
    "ann_ivf2_topk",
]


def oracle_pass(
    book: dict, sf_dir: str, qs: dict, runs: int = 1
) -> None:
    """One DuckDB timing pass over every benched oracle, folding the
    per-query min into ``book``. Per-query error guard: one failing
    oracle must not discard the timings of every later query."""
    try:
        from tools.check import duck_connect

        con = duck_connect(sf_dir)
        con.execute(f"SET threads TO {os.cpu_count()}")
    except Exception:
        return
    for name in HEADLINE + CURATION + ANN_INDEX:
        q = qs.get(name)
        if q is None or not q.oracle:
            continue
        try:
            for _ in range(runs):
                t0 = time.time()
                con.execute(q.oracle).fetchall()
                dt = round(time.time() - t0, 3)
                if name not in book or dt < book[name]:
                    book[name] = dt
        except Exception:
            continue


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Untimed warmup: JVM/JIT + codegen + parquet reader init, so the
    # first timed query measures the engine, not session startup.
    spark.range(2_000_000).selectExpr("sum(id * 2)").write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.mode(
        "overwrite"
    ).format("noop").save()
    # Spawn the Python/Arrow worker pool once so pandas-UDF queries
    # measure compute, not process startup.
    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.mode("overwrite").format("noop").save()

    qs = all_queries()

    # Warmup iteration at the smallest SF: JIT-compiles each query's
    # expression/codegen paths so the timed pass measures steady-state
    # throughput, not first-call compilation.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE + CURATION + ANN_INDEX:
        q = qs.get(name)
        if q is None:
            continue
        try:
            q.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass
    # One untimed FULL-SCALE query before the timed loop: the sf0.001
    # warmup pass JIT-compiles codegen paths but not the sf-dir-scale
    # shuffle/reader paths, and round 6→7 showed the first timed slot
    # (pricing_summary) absorbing ~0.7s of that residual warmup even
    # under min-of-n. Burn it here instead.
    first = qs.get(HEADLINE[0])
    if first is not None:
        first.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    # Repeat the timed pass and report the per-query MIN: this box's
    # wall clock swings >2x under external contention (BENCH_r02's 10x
    # minhash outlier on unchanged code), and min-of-n is the standard
    # steady-state estimator under one-sided noise.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    timings: dict[str, float] = {}
    cur_timings: dict[str, float] = {}
    ann_timings: dict[str, float] = {}
    # First oracle bracket (see the second one below for why two).
    oracle_timings: dict[str, float] = {}
    oracle_pass(oracle_timings, sf_dir, qs, runs=1)
    for _ in range(n_runs):
        for name in HEADLINE + CURATION + ANN_INDEX:
            book = (
                ann_timings
                if name in ANN_INDEX
                else cur_timings
                if name in CURATION
                else timings
            )
            q = qs.get(name)
            if q is None:
                continue
            # GC barrier: each query measured from a comparable heap
            # state, not against previous queries' uncollected garbage.
            # The brief pause after it lets ContextCleaner drain the
            # weak-ref queue the GC just populated (broadcast/shuffle
            # unpersists are processed asynchronously and would
            # otherwise land INSIDE the next timed query — deep-DAG
            # queries with many scheduler round-trips are hit hardest).
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if name not in book or dt < book[name]:
                book[name] = dt
    total = sum(timings.values())

    # Broadcast-payload metric for the decontamination pair: the
    # bloom variant's 100 TB win is bytes-to-every-executor, so the
    # bench records it as a measured number next to the walls.
    try:
        from multi_crm_cross_sell_spark.plans.datapipe import (
            decontamination_broadcast_payload,
        )

        payload = decontamination_broadcast_payload(spark, sf_dir)
    except Exception:
        payload = {}

    # SAME-SESSION DuckDB oracle pass (round-9 verdict item): this
    # box's speed drifts between sessions AND within one (steal time
    # hits the JVM far harder than DuckDB's scan loop), so a
    # spark-vs-oracle ratio is only meaningful when both sides are
    # measured in the SAME session — and the oracle is measured in
    # TWO passes BRACKETING the spark loop (one ran above, via
    # oracle_pass below), min per query across passes: a mid-session
    # epoch change then biases both sides the same way instead of
    # hitting whichever side ran later. min matches the spark side's
    # min-of-n estimator and the judge's tools/oracle_bench.py.
    oracle_pass(oracle_timings, sf_dir, qs, runs=2)

    def _sec_totals(names: list[str], book: dict[str, float]):
        # BOTH sums restricted to queries timed on BOTH sides, so a
        # missing oracle shrinks the comparison instead of skewing it;
        # no oracle at all -> null totals, never a fake ratio.
        both = [n for n in names if n in book and n in oracle_timings]
        if not both:
            return None, None
        o = sum(oracle_timings[n] for n in both)
        s = sum(book[n] for n in both)
        return round(o, 3), round(s / o, 3)

    head_oracle, head_ratio = _sec_totals(HEADLINE, timings)
    cur_oracle, cur_ratio = _sec_totals(CURATION, cur_timings)
    ann_oracle, ann_ratio = _sec_totals(ANN_INDEX, ann_timings)

    totals = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "oracle_total": head_oracle,
        "ratio_vs_oracle": head_ratio,
        "curation_total": round(sum(cur_timings.values()), 3),
        "curation_oracle_total": cur_oracle,
        "curation_ratio": cur_ratio,
        "ann_index_total": round(sum(ann_timings.values()), 3),
        "ann_index_oracle_total": ann_oracle,
        "ann_index_ratio": ann_ratio,
        "curation_total_r7_subset": round(
            sum(
                cur_timings[n]
                for n in CURATION[: CURATION.index("stratified_sample")]
                if n in cur_timings
            ),
            3,
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Big line first (full per-query books for humans and the repo's
    # own tooling), then a SHORT totals-only line LAST: the driver
    # keeps only the final ~2000 output characters, which truncated
    # the big line mid-stream in rounds 9 AND 10 ("parsed": null in
    # BENCH_r09/r10) — totals-first merely moved the scalars into the
    # part that gets cut. A complete, small JSON object at the very
    # end always survives a tail capture intact.
    print(
        json.dumps(
            {
                **totals,
                "queries": timings,
                "curation_queries": cur_timings,
                "ann_index_queries": ann_timings,
                "oracle_queries": oracle_timings,
                "decon_broadcast_payload": payload,
            }
        )
    )
    print(json.dumps(totals))
    spark.stop()


if __name__ == "__main__":
    main()
