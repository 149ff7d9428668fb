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
    "event_tumbling_windows",
    "event_sessionization",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        q = qs.get(name)
        if q is None:
            continue
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
