#!/usr/bin/env python
"""Round-13 optimization profiler (guide §1): per-query wall time,
Spark JOB COUNT, and optional ``explain("formatted")`` capture.

Job count matters on this suite because the biggest remaining cost
family (streaming sinks, incremental batches, iterative graph/kmeans)
is MULTI-JOB: local job overhead is ~0.12-0.15 s (the bench's multijob
canary), so a query that runs 20 jobs pays ~2-3 s of pure scheduling
before any data work — and at cluster scale each extra job is an extra
synchronization barrier + (for checkpoint-shaped jobs) an extra
materialization pass. Fewer jobs is a scale win, not a local trick.

Usage:
  python scripts/profile_r13.py q1 q2 ...     # profile named queries
  python scripts/profile_r13.py --all         # whole registry
  python scripts/profile_r13.py --plans q...  # also write plans/r13/<q>_before.txt
  PROFILE_SUFFIX=after python scripts/profile_r13.py --plans q...  # _after.txt

Writes /tmp/profile_r13.json {name: {"sec": best_of_reps, "jobs": n}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("PROFILE_REPS", "3"))
SUFFIX = os.environ.get("PROFILE_SUFFIX", "before")


def job_count(spark) -> int:
    # high-water job id via the status tracker. len(ids) is WRONG for
    # long sessions: the tracker drops evicted jobs (spark.ui.retainedJobs)
    # so a cumulative length can shrink mid-run (negative deltas seen in
    # the first r13 profile). Job ids are monotonic, so max+1 is a stable
    # cumulative count.
    ids = spark.sparkContext._jsc.sc().statusTracker().getJobIdsForGroup(None)
    return (max(ids) + 1) if ids else 0


def main() -> None:
    import bench
    import __spark_entry__ as entry_mod

    args = [a for a in sys.argv[1:]]
    want_plans = "--plans" in args or "--plans-only" in args
    plans_only = "--plans-only" in args
    run_all = "--all" in args
    names = [a for a in args if not a.startswith("--")]

    spark = bench.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    qs = entry_mod.queries()
    todo = list(qs) if run_all else [n for n in names if n in qs]
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries skipped: {missing}")

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    if want_plans:
        os.makedirs(plans_dir, exist_ok=True)

    out = {}
    for name in todo:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = None
        jobs = None
        for rep in range(0 if plans_only else REPS):
            j0 = job_count(spark)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            j1 = job_count(spark)
            if best is None or dt < best:
                best = dt
            jobs = j1 - j0  # steady-state count from the last rep
        if want_plans:
            try:
                df = fn(spark, SF_DIR)
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                txt = df._jdf.queryExecution().explainString(mode)
                with open(
                    os.path.join(plans_dir, f"{name}_{SUFFIX}.txt"), "w"
                ) as f:
                    f.write(txt)
            except Exception as exc:  # pragma: no cover
                print(f"plan capture failed for {name}: {exc}")
        if not plans_only:
            out[name] = {"sec": round(best, 3), "jobs": jobs}
            print(f"{best:7.2f}s {jobs:4d} jobs  {name}", flush=True)
            with open("/tmp/profile_r13.json", "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
        else:
            print(f"plan captured  {name}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if not plans_only:
        with open("/tmp/profile_r13.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        tot = sum(v["sec"] for v in out.values())
        tj = sum(v["jobs"] for v in out.values())
        print(f"TOTAL {tot:.1f}s over {len(out)} queries, {tj} jobs")
    spark.stop()


if __name__ == "__main__":
    main()
