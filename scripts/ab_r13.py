#!/usr/bin/env python
"""Round-13 interleaved A/B (r12 verdict item 1): r11 code vs current
code on the three sidecar-wired streaming sinks that regressed in the
r12 record WITHOUT adjudication — `cms_sink_stream_batch` 1.84→2.97 s
(1.61×), `embedding_sink_stream_batch` 4.00→5.50 s (1.38×),
`lines_sink_stream_batch` 3.04→3.86 s (1.27×) normalized vs r11.
All three took the same +140-line sidecar probe/pin wiring in
`streaming/sinks.py` that the adjudicated minhash sink took, so the
same methodology applies: equal-canary, alternating fresh-JVM
subprocesses, min-of-3 reps × 3 cycles, code-UNTOUCHED-since-r11
controls. Verdict threshold: any sink >1.15× at equal controls
escalates to hoisting the per-micro-batch sidecar probe/pin into
one-time sink setup.

Usage:
  python scripts/ab_r13.py worker <repo_path>   # one side, one cycle
  python scripts/ab_r13.py                      # orchestrate A/B cycles
"""

import json
import os
import subprocess
import sys
import time

TARGETS = [
    "cms_sink_stream_batch",        # code changed r12 (sidecar wiring)
    "embedding_sink_stream_batch",  # code changed r12 (sidecar wiring)
    "lines_sink_stream_batch",      # code changed r12 (sidecar wiring)
    "pca_embeddings",               # control: llm/pca.py untouched since r9
    "profile_orders",               # control: untouched since r9
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


R11_COMMIT = os.environ.get("AB_R11_COMMIT", "2ab1400")
R11_PATH = os.environ.get("AB_R11_PATH", "/tmp/ab_r11_side")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isdir(R11_PATH):
        # reproducible from the repo alone: materialize the r11 side as
        # a worktree at the round-11 artifact commit
        subprocess.run(
            ["git", "-C", repo, "worktree", "add", R11_PATH, R11_COMMIT],
            check=True,
        )
    sides = {"r11": R11_PATH, "r13": repo}
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
        a, b = summary[name]["r11"], summary[name]["r13"]
        summary[name]["ratio_r13_over_r11"] = round(b / a, 3) if a else None
    record = {"summary": summary, "cycles": results}
    with open("/tmp/ab_r13_result.json", "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
