"""Measured skew-join benchmark (SCALE.md §Skew evidence).

Synthesizes the whale-key regime the salting operator exists for: a
probe table where ONE key owns half of all rows, joined to a 10k-row
dim table that is declared too big to broadcast (threshold -1 — at
production scale the build side of a skewed join often is). Times
three plans over the same data:

  plain-aqe-off   the raw failure mode: one reducer gets half the table
  plain-aqe-on    AQE skew-join splitting (session default)
  salted          operators/skew.salted_join, replication=32

Usage: python tools/skew_bench.py [n_rows] (default 5_000_000)
Prints one JSON line per plan with wall seconds (min of 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from multi_crm_cross_sell_spark.operators.skew import salted_join  # noqa: E402
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # The scenario is "build side too big to broadcast": force the
    # shuffle-join planner so the skew actually lands on a reducer.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    probe = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        .localCheckpoint(eager=True)  # pin inputs so runs time the JOIN
    )
    build = (
        spark.range(10_000)
        .select(F.col("id").alias("k"), (F.col("id") * 3.0).alias("factor"))
        .localCheckpoint(eager=True)
    )

    def timed(label: str, fn) -> None:
        best = None
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(
            json.dumps(
                {"plan": label, "n_rows": n, "wall_sec": round(best, 3)}
            ),
            flush=True,
        )

    def plain():
        return probe.join(build, "k").select(
            "k", (F.col("v") * F.col("factor")).alias("x")
        )

    def salted():
        return salted_join(probe, build, on=["k"], replication=32).select(
            "k", (F.col("v") * F.col("factor")).alias("x")
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed("plain-aqe-off", plain)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed("plain-aqe-on", plain)
    timed("salted", salted)
    spark.stop()


if __name__ == "__main__":
    main()
