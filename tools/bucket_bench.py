"""Bucketed-silver vs flat-parquet join: the shuffle-elision win as a
measured number, not only a plan assertion (tests/test_bucketing.py
asserts zero exchanges; this tool reports wall seconds).

Workload: the orders ⋈ customer equi-join on custkey (the repeated
join key the silver layer exists for, same shape as
`join_revenue_by_nation` / `label_join`), aggregated per nation so
the join output must actually flow. Three variants:

- flat: plain parquet scans, the join shuffles both sides per query;
- bucketed: both tables written once via sources/silver.write_bucketed
  (bucketBy custkey, matching bucket counts) — the planner drops both
  Exchanges, so the per-query cost is scan + local join;
- the one-time bucketing cost is reported too (the "pay the shuffle
  once at ingest" half of the trade).

Usage:
    python tools/bucket_bench.py [sf_dir]     # default sf0.1
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from multi_crm_cross_sell_spark.sources import silver  # noqa: E402
from multi_crm_cross_sell_spark.sources.bronze import load_table  # noqa: E402

N_BUCKETS = 16
N_RUNS = 5


def workload(cust, orders):
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    return j.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(23,2)"))
        .cast("double")
        .alias("revenue"),
    )


def time_runs(build_df, n=N_RUNS):
    ts = []
    for _ in range(n):
        t0 = time.time()
        build_df().write.mode("overwrite").format("noop").save()
        ts.append(round(time.time() - t0, 3))
    return ts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    warehouse = tempfile.mkdtemp(prefix="silver_bench_wh_")

    from pyspark.sql import SparkSession

    from multi_crm_cross_sell_spark.session import tune

    spark = (
        SparkSession.builder.appName("bucket-bench")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the shuffle path
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tune(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setLogLevel("ERROR")

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    t0 = time.time()
    silver.write_bucketed(cust, "cust_b", "c_custkey", n_buckets=N_BUCKETS)
    silver.write_bucketed(orders, "orders_b", "o_custkey", n_buckets=N_BUCKETS)
    ingest_sec = round(time.time() - t0, 3)

    cust_b = silver.read_table(spark, "cust_b")
    orders_b = silver.read_table(spark, "orders_b")

    # warmup both plans
    workload(cust, orders).write.mode("overwrite").format("noop").save()
    workload(cust_b, orders_b).write.mode("overwrite").format("noop").save()

    flat = time_runs(lambda: workload(cust, orders))
    bucketed = time_runs(lambda: workload(cust_b, orders_b))

    ep = workload(cust_b, orders_b)
    ep.collect()
    plan = ep._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    n_exchanges = plan.count("+- Exchange")

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_buckets": N_BUCKETS,
                "flat_min_sec": min(flat),
                "bucketed_min_sec": min(bucketed),
                "speedup": round(min(flat) / min(bucketed), 2),
                "one_time_bucketing_sec": ingest_sec,
                "bucketed_plan_join_exchanges": n_exchanges,
                "flat_all": flat,
                "bucketed_all": bucketed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
