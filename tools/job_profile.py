"""Per-query job/stage profile: run a registered query once (after a
small-SF warmup) and print every Spark job it triggered with stage task
counts and wall time — the scheduling-floor diagnostic for queries whose
sf0.1 cost is stage count, not data volume.

Usage: python tools/job_profile.py q1 [q2 ...]   (SF via $SPARK_GRAFT_SF_DIR)
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
    spark = get_spark("job_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    sc = spark.sparkContext
    lines = []
    for name in names:
        q = qs[name]
        # warmup (codegen + broadcast paths) at the smallest SF
        q.fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
            "noop"
        ).save()
        sc.setJobGroup(name, name)
        sc._jvm.System.gc()
        time.sleep(0.3)
        # Wall = CONSTRUCT (q.fn alone: py4j round trips + eager
        # analysis; the round-12 discovery that this dominated several
        # sub-2s floors) + in-job (summed below) + driver GAPS
        # (per-action re-planning: every save() builds a fresh
        # QueryExecution, so analyzer/optimizer/codegen re-run even
        # when the DataFrame's own plans were pre-computed — the
        # round-13 ann_lsh_topk finding). Measure all three before
        # touching any plan shape.
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        t_construct = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        sc.setJobGroup("idle", "idle")
        tracker = sc.statusTracker()
        jobs = sorted(tracker.getJobIdsForGroup(name))
        # Per-job wall + description from the UI REST API (the Python
        # statusTracker exposes neither): attribution for the job-level
        # floor decompositions in SCALE.md.
        rest: dict[int, tuple[float, str]] = {}
        try:
            store = sc._jsc.sc().statusStore()
            it = store.jobsList(None).iterator()
            while it.hasNext():
                jd = it.next()
                try:
                    sub = jd.submissionTime().get().getTime()
                    comp = jd.completionTime().get().getTime()
                    rest[jd.jobId()] = (
                        (comp - sub) / 1000.0,
                        str(jd.name() or "")[:90],
                    )
                except Exception:
                    continue
        except Exception:
            pass
        injob = sum(
            rest[j][0] for j in jobs if j in rest and rest[j][0] is not None
        )
        lines.append(
            f"== {name}: {wall:.3f}s, {len(jobs)} jobs | "
            f"construct={t_construct:.3f}s injob={injob:.3f}s "
            f"gaps={max(0.0, wall - t_construct - injob):.3f}s"
        )
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                lines.append(f"  job {j}: <expired>")
                continue
            stages = []
            for s in sorted(ji.stageIds):
                si = tracker.getStageInfo(s)
                if si is None:
                    continue
                # skipped stages report 0 active/complete tasks
                stages.append(f"s{s}:{si.numTasks}t")
            dur, jname = rest.get(j, (None, ""))
            extra = f"  [{dur:.3f}s] {jname}" if dur is not None else ""
            lines.append(f"  job {j}: {' '.join(stages)}{extra}")
    spark.stop()
    out = "\n".join(lines) + "\n"
    sys.stdout.write("\n" + out)
    with open("/tmp/job_profile.out", "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
