#!/usr/bin/env python
"""Round-12 interleaved A/B (r11 verdict item 2): r10 code vs current
code on `minhash_sink_stream_batch` — the ONLY top r11 bench regressor
(4.42 → 7.97 s, +80%) whose code path actually changed that round
(xxhash64 default + per-batch state guard + sidecar pin in
`streaming/sinks.py`). The r9-vs-r11 A/B settled the rest of the drift
as host, but skipped the r10→r11 delta for this query; this run
adjudicates it with the same methodology (equal-canary, alternating
fresh-JVM subprocesses, min-of-3 reps × 3 cycles).

Two code-untouched-since-r10 controls ride along: if the sink query
regresses on the A/B while the controls hold ~1.0×, it's the guard
path; if everything moves together, it's host.

Usage:
  python scripts/ab_r12.py worker <repo_path>   # one side, one cycle
  python scripts/ab_r12.py                      # orchestrate A/B cycles
"""

import json
import os
import subprocess
import sys
import time

TARGETS = [
    "minhash_sink_stream_batch",  # the adjudicated query (code changed r11)
    "pca_embeddings",             # control: untouched since r9
    "profile_orders",             # control: untouched since r9
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CYCLES = int(os.environ.get("AB_CYCLES", "3"))
REPS = 3


def worker(repo: str) -> None:
    sys.path.insert(0, repo)
    os.chdir(repo)
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
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
    for name in TARGETS:
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


R10_COMMIT = os.environ.get("AB_R10_COMMIT", "9fb9d8e")
R10_PATH = os.environ.get("AB_R10_PATH", "/tmp/ab_r10_side")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(R10_PATH):
        # reproducible from the repo alone: materialize the r10 side as
        # a worktree at the round-10 artifact commit
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", R10_PATH, R10_COMMIT],
            check=True,
        )
    sides = {"r10": R10_PATH, "r12": repo}
    results = {s: [] for s in sides}
    for cycle in range(CYCLES):
        for side, path in sides.items():
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "worker", path],
                capture_output=True,
                text=True,
                timeout=1200,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")]
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
                f"/{rec['canary_post']} {rec['timings']}"
            )
    summary = {}
    for name in TARGETS:
        summary[name] = {
            s: min(r["timings"][name] for r in results[s]) for s in sides
        }
        a, b = summary[name]["r10"], summary[name]["r12"]
        summary[name]["ratio_r12_over_r10"] = round(b / a, 3) if a else None
    record = {"summary": summary, "cycles": results}
    with open("/tmp/ab_r12_result.json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
