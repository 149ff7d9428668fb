"""Measured Python-boundary cost (SCALE.md §Python boundaries).

Times the three tiers of per-row string work on the same 2M name
pairs, min-of-2 each:

  builtin    F.levenshtein — JVM, whole-stage codegen
  pandas     jaro_winkler_udf — Arrow-batched Python (the engine's one
             irreducible scalar UDF)
  row-udf    the same _jaro_winkler function as a row-at-a-time
             F.udf — the tier the engine REFUSES to use in hot paths

The kernels differ (levenshtein DP vs jaro scan), so the builtin row
is a tier anchor, not an apples-to-apples kernel comparison; pandas
vs row-udf IS the same Python function and isolates the per-row
serialization tax.

Usage: python tools/udf_bench.py [n_pairs] (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math  # noqa: E402

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import pandas_udf  # noqa: E402
from pyspark.sql.types import DoubleType  # noqa: E402

from multi_crm_cross_sell_spark.functions.similarity import (  # noqa: E402
    _jaro_winkler,
    jaro_winkler_udf,
)
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402

WORDS = ("acme", "globex", "initech", "umbrella", "stark", "wayne",
         "cyberdyne", "tyrell", "aperture", "hooli")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("udf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    w1 = F.array(*[F.lit(w) for w in WORDS])
    pairs = (
        spark.range(n)
        .select(
            F.concat(
                F.element_at(w1, (F.pmod(F.col("id"), 10) + 1).cast("int")),
                F.lit(" corp "),
                (F.col("id") % 1000).cast("string"),
            ).alias("a"),
            F.concat(
                F.element_at(w1, (F.pmod(F.col("id") + 3, 10) + 1).cast("int")),
                F.lit(" inc "),
                (F.col("id") % 997).cast("string"),
            ).alias("b"),
        )
        .localCheckpoint(eager=True)
    )

    row_udf = F.udf(lambda a, b: _jaro_winkler(a, b), DoubleType())

    # Vectorizable numeric tier: sigmoid over a double column. Here
    # the pandas UDF's body is ONE numpy expression per batch, so the
    # Arrow tier drops per-row Python entirely — this is the regime
    # where the 10-100x row-UDF tax actually appears.
    nums = (
        spark.range(n)
        .select((F.col("id") % 9973 / 100.0).alias("x"))
        .localCheckpoint(eager=True)
    )

    @pandas_udf(DoubleType())
    def sigmoid_pd(x):
        return 1.0 / (1.0 + np.exp(-x))

    sigmoid_row = F.udf(lambda x: 1.0 / (1.0 + math.exp(-x)), DoubleType())

    cases = {
        "builtin-levenshtein": lambda: pairs.select(
            F.levenshtein("a", "b").alias("d")
        ),
        "pandas-udf-jaro": lambda: pairs.select(
            jaro_winkler_udf("a", "b").alias("d")
        ),
        "row-udf-jaro": lambda: pairs.select(row_udf("a", "b").alias("d")),
        "builtin-sigmoid": lambda: nums.select(
            (1.0 / (1.0 + F.exp(-F.col("x")))).alias("s")
        ),
        "pandas-udf-sigmoid": lambda: nums.select(sigmoid_pd("x").alias("s")),
        "row-udf-sigmoid": lambda: nums.select(sigmoid_row("x").alias("s")),
    }
    for label, fn in cases.items():
        best = None
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn().write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(
            json.dumps(
                {"case": label, "n_pairs": n, "wall_sec": round(best, 3)}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
