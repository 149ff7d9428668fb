"""Micro-bench a few registered queries under bench-like conditions.

Usage: python tools/microbench.py q1 [q2 ...]   (SF via $SPARK_GRAFT_SF_DIR)
Writes one `name seconds` line per query to stdout AND /tmp/microbench.out
(progress bars' carriage returns routinely mangle interleaved stdout).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    lines = []
    for name in names:
        q = qs[name]
        q.fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
        best = float("inf")
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
            t0 = time.time()
            q.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        lines.append(f"{name} {best:.3f}")
    spark.stop()
    out = "\n".join(lines) + "\n"
    sys.stdout.write("\n" + out)
    with open("/tmp/microbench.out", "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
