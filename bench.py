#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink (full computation of every
output column, no driver-collect cost, no pruning of the measured work).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# min-of-N per query: first execution pays plan analysis + codegen
# compile and absorbs machine noise; the min is the steady-state number.
# Default 3 (round-6): this host's documented multi-second stalls make
# best-of-2 records noisy — the third sample costs ~1 extra minute at
# sf0.1 and removes most of the tail.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
# Global wall budget: once exceeded, remaining queries drop from
# REPEATS to TWO runs — one warm-up + one timed (every query still
# runs — coverage never shrinks, only the noise-absorption does).
# Never one: a single cold run bakes plan compilation into the record
# and inflated exactly the tail-position queries when the registry
# outgrew the budget (observed r8: tail entries +30-300% vs their own
# history on unchanged code). Guards against an external runner's time
# limit on a badly stalling host.
#
# Raised 420 → 720 → 1080 → 1500 as the registry grew: at 420 the
# whole tail fell to min-of-2 and single host stalls (documented ±30%
# swings) landed unabsorbed; 720 sat exactly at the cliff on a
# stalling host (162 queries × ~1.5 s stall-inflated avg × 3 reps ≈
# 720 s — the first 162-query record still tripped it); 1080 tripped
# in turn at 198 queries (suite best-of ≈ 277 s → 3-rep wall ≈
# 1100 s+, r9 third session). 1500 puts the 3-rep suite inside the
# budget at ~200 queries even on a bad host window; ~25 min worst case
# remains inside the round driver's tolerance.
BUDGET_S = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1500"))
# Drift canary (round-6 verdict item 4): this host's suite totals swing
# ±30% on UNCHANGED code (BASELINE.md r4-r6 interleaved A/Bs), so raw
# per-round totals are hostage to when the driver happens to run. A
# fixed reference query — parquet scan + groupBy-agg on lineitem,
# independent of any engine code so it is identical across rounds — is
# interleaved every CANARY_EVERY queries; the record carries the raw
# samples plus a canary-normalized total: total * NOMINAL / median.
# CANARY_NOMINAL_S is the idle-host median for this canary at sf0.1
# (pinned round 7; see BASELINE.md) — normalized totals are comparable
# across rounds as long as this constant never changes.
CANARY_EVERY = int(os.environ.get("SPARK_GRAFT_BENCH_CANARY_EVERY", "20"))
CANARY_NOMINAL_S = 0.35
# Tiered repeats (round-10, VERDICT r9 item 7): min-of-3 over the whole
# registry stops fitting BUDGET_S on a stalling host somewhere past
# ~220 queries (198 queries ≈ 16 min worst case at r9). Policy, also
# documented in BASELINE.md §bench-policy: EVERY query always runs
# (coverage never shrinks); once the registry exceeds TIER_AT entries,
# only the DEEP tier keeps min-of-REPEATS — the external first-50
# window plus any query with no entry in the latest BENCH_r*.json
# record (i.e. new since the last round) — and the veteran tail drops
# to min-of-2 (warm-up + timed). Inactive below TIER_AT, so records
# stay directly comparable until the registry actually crosses the
# line. The wall-budget degradation below still applies on top.
TIER_AT = int(os.environ.get("SPARK_GRAFT_BENCH_TIER_AT", "220"))
DEEP_WINDOW = 50
# Second canary (round-8 verdict item 7): the r8 JIT code-cache cliff
# was INVISIBLE to the small-plan canary above — its tiny codegen body
# stayed compiled while the suite's giant unrolled expressions
# exhausted the cache and silently de-optimized tail queries. This
# canary IS such an expression (64 unrolled arithmetic terms over two
# lineitem columns), so cache exhaustion / JIT de-optimization shows
# up as codegen-canary drift in the record instead of unexplained tail
# inflation. Nominal pinned r9: 0.46 s = idle-host median of 7 samples
# at sf0.1 after one compile warm-up (BASELINE.md r9).
CANARY2_NOMINAL_S = 0.46
# Third canary (round-11): the r8 and r10 inflation episodes both
# concentrated in MULTI-JOB queries (iterative/incremental classes —
# oov_stats, langid_corpus_report, funnel_stream_batch...) and were
# INVISIBLE to the two canaries above, because each of those is a
# single job while the stall class lives BETWEEN jobs (host/scheduler
# hiccups at job boundaries; both interleaved A/Bs — r9 and r11 —
# attributed the inflation to host windows, not code). This canary is
# FIVE tiny scheduler-bound jobs back-to-back (range-sum: no scan, no
# shuffle, ~fixed per-job overhead), so a between-job stall window
# inflates it in the record while the single-job canaries stay
# nominal — exactly the signature that previously needed a worktree
# A/B to diagnose. Nominal pinned r11: 0.76 s = idle-host median of
# 2×7 samples (0.755/0.773 medians; ~150 ms fixed overhead per tiny
# job on local[32] — BASELINE.md r11). Diagnostic only — normalization
# stays on the first canary so normalized totals remain comparable
# across rounds.
CANARY3_NOMINAL_S = 0.76


def build_spark() -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("kolang-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        # 161 queries × min-of-3 reps of whole-stage-codegen classes
        # (some are deliberately huge — unrolled 64-dim dot products,
        # 8×64-term LSH signatures) overflow the JVM's default 240 MB
        # JIT code cache mid-suite; the JIT then stops compiling and
        # tail-position queries measure 3-5× their solo/steady-state
        # cost (ann_lsh_topk 1.1 s solo vs 5.8 s at position ~120 —
        # reproduced on an idle host, min-of-3). A larger code cache
        # keeps the whole suite JIT-compiled.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _canary_df(spark: SparkSession):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _canary_codegen_df(spark: SparkSession):
    # one giant whole-stage-codegen body: 64 unrolled terms per row,
    # engine-independent (plain lineitem columns, fixed literals)
    terms = " + ".join(
        f"(l_quantity * {i} + l_extendedprice / {i}.5)" for i in range(1, 65)
    )
    return (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .selectExpr(f"0.0D + {terms} AS x")
        .selectExpr("sum(x) AS s")
    )


def _run_canary(spark: SparkSession) -> float:
    t0 = time.perf_counter()
    _canary_df(spark).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _run_canary_codegen(spark: SparkSession) -> float:
    t0 = time.perf_counter()
    _canary_codegen_df(spark).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _run_canary_multijob(spark: SparkSession) -> float:
    t0 = time.perf_counter()
    for _ in range(5):
        spark.range(1_000_000).selectExpr("sum(id) AS s").write.format(
            "noop"
        ).mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    import __spark_entry__ as entry_mod

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JVM classloading, codegen compiler, noop sink, and
    # the Python (Arrow UDF) worker pool are session fixtures — the bench
    # measures query execution, not cold-start
    spark.range(100).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        import pandas as _pd

        spark.range(100).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass

    _run_canary(spark)  # untimed: compile all three canaries' codegen once
    _run_canary_codegen(spark)
    _run_canary_multijob(spark)

    qs = entry_mod.queries()
    deep: set = set(qs)
    tiered = len(qs) > TIER_AT
    if tiered:
        # "new since last round" = absent from the bench's own last
        # full record (BENCH_LOCAL_FULL.json is rewritten every run and
        # committed by the driver, so it is exactly last round's
        # coverage; the driver's BENCH_r*.json files truncate stdout
        # and don't carry a full keyed dict)
        recorded: set = set()
        prev = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_FULL.json"
        )
        try:
            recorded = set(json.load(open(prev)).get("queries", {}))
        except Exception:
            recorded = set()
        deep = set(list(qs)[:DEEP_WINDOW]) | (set(qs) - recorded)
    timings: dict[str, float] = {}
    canary_samples: list[float] = []
    canary2_samples: list[float] = []
    canary3_samples: list[float] = []
    canary_positions: list[int] = []
    suite_t0 = time.perf_counter()
    budget_hit = False
    for pos, (name, fn) in enumerate(qs.items()):
        if pos % max(1, CANARY_EVERY) == 0:
            canary_samples.append(round(_run_canary(spark), 3))
            canary2_samples.append(round(_run_canary_codegen(spark), 3))
            canary3_samples.append(round(_run_canary_multijob(spark), 3))
            canary_positions.append(pos)
        best = None
        reps = max(1, REPEATS)
        if tiered and name not in deep:
            reps = min(reps, 2)  # veteran tail past TIER_AT: warm + timed
        if time.perf_counter() - suite_t0 > BUDGET_S:
            budget_hit = True
            reps = min(reps, 2)  # warm-up + timed, never cold-only
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 2)
    canary_samples.append(round(_run_canary(spark), 3))
    canary2_samples.append(round(_run_canary_codegen(spark), 3))
    canary3_samples.append(round(_run_canary_multijob(spark), 3))
    canary_positions.append(len(qs))
    total = round(sum(timings.values()), 2)

    def _median(xs):
        srt = sorted(xs)
        return round((srt[len(srt) // 2] + srt[(len(srt) - 1) // 2]) / 2, 3)

    canary_median = _median(canary_samples)
    canary2_median = _median(canary2_samples)
    normalized_total = round(
        total * CANARY_NOMINAL_S / max(canary_median, 1e-6), 2
    )

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    record = {
        "metric": f"suite_sec_best_of_{max(1, REPEATS)}_noop",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf else None,
        "budget_hit": budget_hit,
        "tiered": tiered,
        "deep_n": len(deep) if tiered else len(qs),
        "canary": {
            "samples": canary_samples,
            "positions": canary_positions,
            "median": canary_median,
            "nominal": CANARY_NOMINAL_S,
        },
        "canary_codegen": {
            "samples": canary2_samples,
            "positions": canary_positions,
            "median": canary2_median,
            "nominal": CANARY2_NOMINAL_S,
        },
        "canary_multijob": {
            "samples": canary3_samples,
            "positions": canary_positions,
            "median": _median(canary3_samples),
            "nominal": CANARY3_NOMINAL_S,
        },
        "normalized_total": normalized_total,
        "queries": timings,
    }
    # Emission layout (round-5 verdict item 3): the driver records only
    # the LAST 2000 chars of stdout and json-parses what fits — but the
    # full per-query dict alone is ~2.4 KB at 80+ queries, so no single
    # spec-shaped line can ever survive the tail whole. Three-part fix:
    #   1. the complete keyed record is WRITTEN to BENCH_LOCAL_FULL.json
    #      next to this script (the driver commits uncommitted work, so
    #      the full record lands in the repo history every round);
    #   2. the spec-shaped line is printed FIRST (complete in local
    #      logs; its tail — the newest queries — survives the buffer);
    #   3. the FINAL line is a compact (<700 B) fully-parseable summary
    #      carrying the total plus EVERY query's timing as an array in
    #      queries() registry order (names recoverable by zipping with
    #      the registry), so the parsed tail loses nothing.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL_FULL.json"), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record, separators=(",", ":")))
    print(
        json.dumps(
            {
                "metric": record["metric"],
                "value": total,
                "unit": "sec",
                "sf": record["sf"],
                "n_queries": len(timings),
                "canary_median": canary_median,
                "canary_codegen_median": canary2_median,
                "canary_multijob_median": _median(canary3_samples),
                "normalized_total": normalized_total,
                "order": "registry",
                "full_record": "BENCH_LOCAL_FULL.json",
                "timings": [timings[k] for k in timings],
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
