#!/usr/bin/env python
"""Round-13 interleaved A/B: BEFORE (a pinned worktree) vs AFTER (this
repo) on named queries, with code-untouched controls riding along —
the committed ab_r12.py methodology (equal-canary, alternating
fresh-JVM subprocesses, min-of-REPS × CYCLES cycles). Host stalls on
this box inflate any single window by multi-seconds, so a target is
only accepted as a real code delta when it moves while the controls
hold ~1.0x.

Usage:
  python scripts/ab_r13.py worker <repo_path> q1 q2 ...  # one side
  AB_BEFORE_PATH=/tmp/wt_head python scripts/ab_r13.py q1 q2 ...
"""

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "3"))
REPS = int(os.environ.get("AB_REPS", "3"))
CONTROLS = [
    c
    for c in os.environ.get("AB_CONTROLS", "profile_orders,pca_embeddings").split(",")
    if c
]
BEFORE_PATH = os.environ.get("AB_BEFORE_PATH", "/tmp/wt_head")
OUT = os.environ.get("AB_OUT", "/tmp/ab_r13_result.json")


def worker(repo: str, targets) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def canary() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.avg("l_extendedprice").alias("avg_price"),
                F.count(F.lit(1)).alias("n"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    spark.range(100).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    canary()  # untimed compile
    out = {"canary_pre": round(canary(), 3), "timings": {}}
    for name in targets:
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["timings"][name] = round(best, 2)
    out["canary_post"] = round(canary(), 3)
    spark.stop()
    print("ABRESULT " + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3:])
        return
    targets = sys.argv[1:]
    if not targets:
        sys.exit("usage: ab_r13.py q1 q2 ...")
    allq = targets + [c for c in CONTROLS if c not in targets]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sides = {"before": BEFORE_PATH, "after": repo}
    results = {s: [] for s in sides}
    for cycle in range(CYCLES):
        for side, path in sides.items():
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", path]
                + allq,
                capture_output=True,
                text=True,
                timeout=2400,
            )
            line = [
                ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")
            ]
            if not line:
                print(
                    f"cycle {cycle} side {side} FAILED:\n"
                    f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
                )
                sys.exit(1)
            rec = json.loads(line[0][len("ABRESULT "):])
            results[side].append(rec)
            print(
                f"cycle {cycle} {side}: canary {rec['canary_pre']}"
                f"/{rec['canary_post']} {rec['timings']}",
                flush=True,
            )
    summary = {}
    for name in allq:
        summary[name] = {
            s: min(r["timings"][name] for r in results[s]) for s in sides
        }
        a, b = summary[name]["before"], summary[name]["after"]
        summary[name]["ratio_after_over_before"] = (
            round(b / a, 3) if a else None
        )
    record = {"summary": summary, "cycles": results}
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
