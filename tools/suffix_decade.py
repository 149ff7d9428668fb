"""Suffix-family decade sweep (documents only) + storage-pressure probe.

Round-11 continuation of the SCALE.md round-10 triage: times the
capped(32) cross_doc_repeat -> exact_repeat_doc_stats pipeline at
1x / 10x / 100x token-disjoint document replicas (same construction
as tools/scale_bench.py, but documents only — the suffix family never
touches the other tables, and a 100x events build would dominate the
wall for nothing), and AFTER the top-decade run dumps the persisted
RDD storage footprint + disk-spill split, turning the "history-RDD
storage pressure" suspect into a measurement instead of a guess.

Usage:
    python tools/suffix_decade.py [factor ...]   # default: 1 10 100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)


def build_docs(spark, factor: int) -> str:
    out = os.path.join(ROOT, f"docs{factor}x")
    if os.path.exists(f"{out}/documents.parquet"):
        return out
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for k in range(factor):
        d = docs
        if k > 0:
            new_text = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"r{k}"), w),
                ),
                " ",
            )
            d = d.select(
                (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
                new_text.alias("text"),
                "lang",
                "source",
                F.length(new_text).cast("long").alias("n_chars"),
            )
        parts.append(d)
    scaled = parts[0]
    for p in parts[1:]:
        scaled = scaled.unionByName(p)
    os.makedirs(out, exist_ok=True)
    tmp = f"{out}/_documents_dir"
    scaled.coalesce(max(4, factor // 2)).write.mode("overwrite").parquet(tmp)
    os.rename(tmp, f"{out}/documents.parquet")
    return out


def run_pipeline(spark, sf_dir: str):
    from multi_crm_cross_sell_spark.operators.suffix import (
        cross_doc_repeat,
        exact_repeat_doc_stats,
    )
    from multi_crm_cross_sell_spark.sources.bronze import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "w")
    )
    rep = cross_doc_repeat(toks, cap=32)
    return exact_repeat_doc_stats(rep, mark_k=5, flag_words=20, cap=32)


def storage_info(spark) -> dict:
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    total_mem = sum(i.memSize() for i in infos)
    total_disk = sum(i.diskSize() for i in infos)
    return {
        "persisted_rdds": len(infos),
        "mem_bytes": int(total_mem),
        "disk_bytes": int(total_disk),
        "max_single_mem": int(max((i.memSize() for i in infos), default=0)),
    }


def main() -> None:
    from multi_crm_cross_sell_spark.session import get_spark

    factors = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1, 10, 100]
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark("suffix-decade")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup
    run_pipeline(spark, "/root/testdata/sf0.001").write.mode(
        "overwrite"
    ).format("noop").save()
    # Per-run JIT/GC attribution (round 12, for the cold-vs-warm
    # decomposition): snapshot the JVM compilation and GC MXBean
    # counters around each run — the cold-run delta IS the C2/C1
    # compile time and collector time that run absorbed.
    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def jit_ms() -> int:
        return int(mf.getCompilationMXBean().getTotalCompilationTime())

    def gc_ms() -> int:
        total = 0
        it = mf.getGarbageCollectorMXBeans().iterator()
        while it.hasNext():
            total += int(it.next().getCollectionTime())
        return total

    for factor in factors:
        sf_dir = SRC if factor == 1 else build_docs(spark, factor)
        best = None
        stor = None
        walls = []
        for _ in range(runs):
            spark.sparkContext._jvm.System.gc()
            j0, g0 = jit_ms(), gc_ms()
            t0 = time.time()
            run_pipeline(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = round(time.time() - t0, 1)
            walls.append(
                {
                    "wall": dt,
                    "jit_ms": jit_ms() - j0,
                    "gc_ms": gc_ms() - g0,
                }
            )
            # snapshot BEFORE GC clears the run's checkpoints
            stor = storage_info(spark)
            best = dt if best is None or dt < best else best
        print(
            json.dumps(
                {
                    "factor": factor,
                    "min_sec": best,
                    "runs": runs,
                    "per_run": walls,
                    **stor,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
