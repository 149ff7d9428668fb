"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall seconds.

Queries execute through the noop sink so the full plan (scan → shuffle
→ projection) runs without driver-side collect cost.

Measurement protocol (round 12): each query's DuckDB oracle is timed
INTERLEAVED with its Spark runs — spark/duck/spark/duck adjacent in
time, min each side, per-query ratio = ratio of adjacent mins. Earlier
rounds ran the oracle in separate bracketing passes; within-session
epoch drift (steal time hits the JVM 3-6x harder than DuckDB) made the
same code read 1.83x and 2.59x on the same section in two sessions.
Section ratios are reported BOTH ways: sum-of-walls / sum-of-oracles
(comparable to earlier rounds) and the MEDIAN per-query ratio (robust
to scheduling-floor outliers on sub-second queries).
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
    "er_match_cascade",
    "event_tumbling_windows",
    "event_sessionization",
    # Python-stage-last ordering rule (round 14, from
    # tools/scale_bench.py): queries that spin up Python workers run
    # at the SECTION TAIL, because the round-13 JVM profile-pollution
    # measurement showed one pandas-UDF query degrading a LATER
    # JVM-only pair query 5.0→34.5s in the same session. Section
    # totals are order-independent (same query set), so this only
    # de-risks the JVM queries' walls.
    "extractive_summary",
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
    # Round 12: previously unbenched (the only registered dedup-family
    # query with no recorded wall) — the label-propagation fixpoint.
    "near_dup_clusters",
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
    # round 12 newcomer (predicate-filtered exact top-k), from birth:
    "ann_filtered_topk",
    # round 13 newcomer (indexed filtered ANN — label pushed into the
    # IVF cell scan), from birth:
    "ann_ivf_filtered_topk",
]

# Fourth section (round 14, verdict item 6): the CRM pair-generator
# family. These sat in NO bench section while carrying a 4-8x
# single-core AQE-coalescer defect for rounds (the decade harness
# caught it, not the bench) — now they get recorded walls + ratios
# every round. Runs LAST of all sections, with the pandas-UDF query
# (jaro_winkler_pairs — the measured JVM-profile polluter,
# SCALE.md §Round 13) at the very end per the Python-stage-last
# ordering rule, so its profile pollution cannot touch any other
# timed query.
PAIRGEN = [
    "token_jaccard_pairs",
    "er_threshold_sweep",
    "jaro_winkler_pairs",
]


def duck_con(sf_dir: str):
    """DuckDB connection for the oracle side, or None when the oracle
    harness is unavailable (bench then records walls without ratios)."""
    try:
        from tools.check import duck_connect

        con = duck_connect(sf_dir)
        con.execute(f"SET threads TO {os.cpu_count()}")
        return con
    except Exception:
        return None


def interleaved_measure(spark, con, q, sf_dir: str, runs: int):
    """INTERLEAVED per-query protocol (round-12): spark/duck/spark/duck
    adjacent in time, ``runs`` pairs, min each side.

    Why: this box's speed drifts WITHIN a session (steal time hits the
    JVM 3-6x harder than DuckDB's scan loop), so two separated timing
    passes — even passes bracketing each other — measured the SAME
    code at section ratios 1.83x and 2.59x across sessions (round-11
    verdict). Adjacent-in-time pairs make each query's ratio a
    comparison of the same box epoch; min-of-pairs on each side keeps
    the one-sided-noise estimator.

    Per-run error guards: a failing oracle never discards the spark
    walls (ratio is simply absent); a failing spark run never blocks
    the remaining pairs. Returns (spark_min, oracle_min, error) —
    walls may be None; ``error`` carries the LAST exception message
    per SIDE, with that side's failure count, and a side's error is
    CLEARED when a later run of the same side succeeds (round-13
    ADVICE: a transient run-1 failure followed by valid walls must
    not land in the errors map as if the query errored every run —
    n_errors distinguishes 'erroring now' from 'never benched', not
    'hiccuped once')."""
    s_min: float | None = None
    d_min: float | None = None
    s_err: str | None = None
    d_err: str | None = None
    s_fail = 0
    d_fail = 0
    for _ in range(runs):
        # GC barrier: each query measured from a comparable heap
        # state, not against previous queries' uncollected garbage.
        # The brief pause after it lets ContextCleaner drain the
        # weak-ref queue the GC just populated (broadcast/shuffle
        # unpersists are processed asynchronously and would
        # otherwise land INSIDE the next timed query).
        try:
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.time()
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if s_min is None or dt < s_min:
                s_min = dt
            s_err = None  # a later success clears a transient failure
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            s_fail += 1
            s_err = f"spark({s_fail}/{runs} runs failed): {type(e).__name__}: {e}"[:300]
        if con is not None and q.oracle:
            try:
                t0 = time.time()
                con.execute(q.oracle).fetchall()
                dt = round(time.time() - t0, 3)
                if d_min is None or dt < d_min:
                    d_min = dt
                d_err = None
            except Exception as e:  # noqa: BLE001
                d_fail += 1
                d_err = f"duckdb({d_fail}/{runs} runs failed): {type(e).__name__}: {e}"[:300]
    err = "; ".join(x for x in (s_err, d_err) if x) or None
    return s_min, d_min, err


def epoch_probe(spark, con) -> dict[str, float | None]:
    """Fixed reference microbenchmark (round-12 verdict item 7): one
    Spark noop aggregation over a generated range + one DuckDB scan of
    the same shape, each min-of-3. Run at bench START and END; the two
    readings let any driver-vs-builder section-ratio gap be attributed
    to box epoch (steal time hits the JVM 3-6x harder than DuckDB) in
    one read, without re-running anything."""
    s_min: float | None = None
    d_min: float | None = None
    for _ in range(3):
        try:
            t0 = time.time()
            spark.range(0, 20_000_000, 1, 32).selectExpr(
                "sum(id * 3 + 1) as s"
            ).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            if s_min is None or dt < s_min:
                s_min = dt
        except Exception:
            pass
        if con is not None:
            try:
                t0 = time.time()
                con.execute(
                    "SELECT sum(i * 3 + 1) FROM range(20000000) t(i)"
                ).fetchall()
                dt = time.time() - t0
                if d_min is None or dt < d_min:
                    d_min = dt
            except Exception:
                pass
    return {
        "spark": round(s_min, 4) if s_min is not None else None,
        "duck": round(d_min, 4) if d_min is not None else None,
    }


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
    for name in HEADLINE + CURATION + ANN_INDEX + PAIRGEN:
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
    # Per-query INTERLEAVED spark/duck pairs (interleaved_measure),
    # min each side: min-of-n is the steady-state estimator under
    # one-sided noise (this box swings >2x under external contention),
    # and adjacency makes the per-query ratio epoch-robust.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    timings: dict[str, float] = {}
    cur_timings: dict[str, float] = {}
    ann_timings: dict[str, float] = {}
    pair_timings: dict[str, float] = {}
    oracle_timings: dict[str, float] = {}
    ratios: dict[str, float] = {}
    errors: dict[str, str] = {}
    con = duck_con(sf_dir)
    epoch_start = epoch_probe(spark, con)
    # One untimed oracle warmup so the first timed duck run measures
    # the query, not catalog/view binding.
    if con is not None and first is not None and first.oracle:
        try:
            con.execute(first.oracle).fetchall()
        except Exception:
            pass
    for name in HEADLINE + CURATION + ANN_INDEX + PAIRGEN:
        book = (
            pair_timings
            if name in PAIRGEN
            else ann_timings
            if name in ANN_INDEX
            else cur_timings
            if name in CURATION
            else timings
        )
        q = qs.get(name)
        if q is None:
            continue
        s_min, d_min, err = interleaved_measure(spark, con, q, sf_dir, n_runs)
        if s_min is not None:
            book[name] = s_min
        if d_min is not None:
            oracle_timings[name] = d_min
        if s_min is not None and d_min is not None and d_min > 0:
            ratios[name] = round(s_min / d_min, 3)
        if err is not None:
            errors[name] = err
    epoch_end = epoch_probe(spark, con)
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
    pair_oracle, pair_ratio = _sec_totals(PAIRGEN, pair_timings)

    def _median_ratio(names: list[str]):
        # Median of the per-query adjacent-min ratios: robust to the
        # scheduling-floor outliers that dominate the TOTAL-based
        # ratio at sf0.1 (a 0.3s spark wall over a 10ms duck scan is
        # a 30x "ratio" worth 0.3s), and epoch-robust because each
        # ratio compares adjacent-in-time runs.
        rs = sorted(ratios[n] for n in names if n in ratios)
        if not rs:
            return None
        mid = len(rs) // 2
        m = rs[mid] if len(rs) % 2 else (rs[mid - 1] + rs[mid]) / 2
        return round(m, 3)

    totals = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "oracle_total": head_oracle,
        "ratio_vs_oracle": head_ratio,
        "ratio_median": _median_ratio(HEADLINE),
        "curation_total": round(sum(cur_timings.values()), 3),
        "curation_oracle_total": cur_oracle,
        "curation_ratio": cur_ratio,
        "curation_ratio_median": _median_ratio(CURATION),
        "ann_index_total": round(sum(ann_timings.values()), 3),
        "ann_index_oracle_total": ann_oracle,
        "ann_index_ratio": ann_ratio,
        "ann_index_ratio_median": _median_ratio(ANN_INDEX),
        "pairgen_total": round(sum(pair_timings.values()), 3),
        "pairgen_oracle_total": pair_oracle,
        "pairgen_ratio": pair_ratio,
        "pairgen_ratio_median": _median_ratio(PAIRGEN),
        "curation_total_r7_subset": round(
            sum(
                cur_timings[n]
                for n in CURATION[: CURATION.index("stratified_sample")]
                if n in cur_timings
            ),
            3,
        ),
        # Box-epoch scalars (round-12 verdict item 7): identical fixed
        # microbenchmark at bench start and end. Compare these across
        # sessions before comparing section ratios.
        "epoch_spark_start": epoch_start["spark"],
        "epoch_duck_start": epoch_start["duck"],
        "epoch_spark_end": epoch_end["spark"],
        "epoch_duck_end": epoch_end["duck"],
        "n_errors": len(errors),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Big line first (full per-query books for humans and the repo's
    # own tooling), then a SHORT line LAST: the driver keeps only the
    # final ~2000 output characters, which truncated the big line
    # mid-stream in rounds 9 AND 10 ("parsed": null in BENCH_r09/r10)
    # — totals-first merely moved the scalars into the part that gets
    # cut. A complete, small JSON object at the very end always
    # survives a tail capture intact.
    print(
        json.dumps(
            {
                **totals,
                "queries": timings,
                "curation_queries": cur_timings,
                "ann_index_queries": ann_timings,
                "pairgen_queries": pair_timings,
                "oracle_queries": oracle_timings,
                "ratio_queries": ratios,
                "errors": errors,
                "decon_broadcast_payload": payload,
            }
        )
    )
    print(
        compact_final_line(
            totals, timings, ratios, ann_timings, pair_timings, cur_timings
        )
    )
    spark.stop()


# Byte budget for the FINAL one-line JSON: the driver records (and
# parses) only the last ~2000 characters of stdout, so the final line
# must be complete inside that window or the whole bench reads as
# "parsed": null (rounds 9/10). 1950 leaves headroom for the trailing
# newline plus any stray shutdown output.
FINAL_LINE_BUDGET = 1950


def compact_final_line(
    totals: dict,
    timings: dict[str, float],
    ratios: dict[str, float],
    ann_timings: dict[str, float],
    pair_timings: dict[str, float],
    cur_timings: dict[str, float],
) -> str:
    """Final one-line JSON: section totals PLUS as much per-query data
    as fits the driver's tail-capture budget (round-15, verdict item
    1 — PERF's per_query/geomean/scaling blocks were EMPTY for two
    rounds because the totals-only final line carried no per-query
    walls and the big detail line is truncated past recovery).

    Additions-only: every totals key is unchanged; the per-query
    books are ADDED greedily in priority order — headline walls (the
    driver contract's "queries" map), headline ratios, then the other
    sections' walls — each block only if the whole line still
    serializes under FINAL_LINE_BUDGET bytes (measured: totals ≈610 B
    compact; headline walls+ratios ≈1.2 kB; all four sections ≈2.4 kB
    do NOT fit, which is why this is greedy rather than exhaustive).
    Values are rounded to 2 decimals in this line only; the preceding
    big line keeps the full 3-decimal books. Compact separators, no
    whitespace."""

    def _r2(book: dict[str, float]) -> dict[str, float]:
        return {n: round(v, 2) for n, v in book.items()}

    short = dict(totals)
    blocks = [
        ("queries", _r2(timings)),
        ("ratio_queries", _r2({n: ratios[n] for n in timings if n in ratios})),
        ("ann_index_queries", _r2(ann_timings)),
        ("pairgen_queries", _r2(pair_timings)),
        ("curation_queries", _r2(cur_timings)),
    ]
    for key, book in blocks:
        if not book:
            continue
        cand = {**short, key: book}
        if len(json.dumps(cand, separators=(",", ":"))) <= FINAL_LINE_BUDGET:
            short = cand
    return json.dumps(short, separators=(",", ":"))


if __name__ == "__main__":
    main()
