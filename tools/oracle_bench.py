"""Time the DuckDB oracle SQL for registered queries at a given SF.

Usage: python tools/oracle_bench.py [sf_dir] [q1 q2 ...]
Defaults: /root/testdata/sf0.1, all bench HEADLINE+CURATION+ANN_INDEX queries.
Prints `name seconds` (min over $SPARK_GRAFT_BENCH_RUNS, default 3) so
bench.py walls can be compared against the same-box oracle, matching
the judge's methodology (VERDICT r7 re-measured the oracle per-box).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402
from tools.check import TABLES, duck_connect  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.CURATION + bench.ANN_INDEX
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    qs = all_queries()
    con = duck_connect(sf_dir)
    con.execute(f"SET threads TO {os.cpu_count()}")
    total = 0.0
    lines = []
    for name in names:
        q = qs.get(name)
        if q is None or not q.oracle:
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            con.execute(q.oracle).fetchall()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        total += best
        lines.append(f"{name} {best:.3f}")
    out = "\n".join(lines) + f"\nTOTAL {total:.3f}\n"
    sys.stdout.write(out)
    with open("/tmp/oracle_bench.out", "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
