#!/usr/bin/env python
"""Scaling sweep for the round-9 third-session operators.

Measures wall time vs input scale by replicating sf0.1 inputs into
DISJOINT copies (suffixed entity ids — no artificial key collapse):

- ``funnel`` (events at 1×/4×/16×): expected linear — one shuffle on
  the user key, per-user Column fold; state = the user's own funnel
  events.
- ``trailing`` (trailing_window_agg, two windows, at 1×/4×/16×):
  expected ~linear (sort-dominated n·log n within partitions) — one
  shuffle + one sort for all four features.
- ``bloom_semi`` (orders vs a high-balance customer filter at
  1×/4×/16× orders, fixed small side): expected linear in the big
  side — the bitmask probe is map-side; only survivors join.
- ``label_prop`` (purchase graph edges at 1×/4×, 2 rounds): expected
  linear in edges per round — one equi-join + two map-side
  aggregates per round, edge frame pinned once.
- ``cusum`` / ``transitions`` (events at 1×/4×/16×): expected
  ~linear — single entity-key shuffle each.

Timings are warm best-of-2 on an otherwise idle machine. One JSON
line per sweep point; paste the summary into BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def timed(fn, runs=2):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, n


def replicate(df, id_col, copies):
    if copies == 1:
        return df
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * 10_000_000).cast("long"))
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sweep-r9c")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kolang_spark.sources.io import read_table
    from kolang_spark.operators.funnel import funnel_steps
    from kolang_spark.operators.features import (
        event_transitions,
        trailing_window_agg,
    )
    from kolang_spark.operators.anomaly import cusum_shift
    from kolang_spark.operators.sketches import bloom_semi_join
    from kolang_spark.operators.graph import label_propagation

    ev0 = read_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts_ms", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)
    od0 = read_table(spark, SF_DIR, "orders").localCheckpoint(eager=True)
    li0 = read_table(spark, SF_DIR, "lineitem").localCheckpoint(eager=True)
    cu = read_table(spark, SF_DIR, "customer").where(
        F.col("c_acctbal") > 9000
    ).localCheckpoint(eager=True)

    for copies in (1, 4, 16):
        ev = replicate(ev0, "user_id", copies).localCheckpoint(eager=True)
        n_in = ev.count()

        dt, n = timed(
            lambda: funnel_steps(
                ev, ["view", "click", "purchase"]
            ).count()
        )
        print(json.dumps({"sweep": "funnel", "copies": copies,
                          "rows_in": n_in, "rows_out": n, "sec": round(dt, 2)}))

        # force the window columns through an aggregate — a bare
        # count() would let the optimizer prune the windows away and
        # time an empty scan
        dt, n = timed(
            lambda: int(
                trailing_window_agg(
                    ev, ["user_id"], windows_ms=[3600_000, 86400_000],
                    value_col="cents",
                )
                .agg(F.count("n_3600000ms"), F.sum("sum_86400000ms"))
                .collect()[0][0]
            )
        )
        print(json.dumps({"sweep": "trailing", "copies": copies,
                          "rows_in": n_in, "rows_out": n, "sec": round(dt, 2)}))

        dt, n = timed(
            lambda: int(
                cusum_shift(
                    ev.groupBy("user_id", "event_type",
                               F.col("ts_ms").cast("long").alias("d"))
                    .agg(F.count(F.lit(1)).alias("n")),
                    "d", "n", by=["user_id", "event_type"], reference=1,
                )
                .agg(F.count("cusum"))
                .collect()[0][0]
            )
        )
        print(json.dumps({"sweep": "cusum", "copies": copies,
                          "rows_in": n_in, "rows_out": n, "sec": round(dt, 2)}))

        dt, n = timed(
            lambda: event_transitions(
                ev, ["user_id"], "ts_ms", "event_type",
                order_cols=["event_id"],
            ).count()
        )
        print(json.dumps({"sweep": "transitions", "copies": copies,
                          "rows_in": n_in, "rows_out": n, "sec": round(dt, 2)}))

        od = replicate(od0, "o_orderkey", copies).localCheckpoint(eager=True)
        n_od = od.count()
        dt, n = timed(
            lambda: bloom_semi_join(
                od, cu, "o_custkey", right_key="c_custkey", n_bits=1 << 14
            ).count()
        )
        print(json.dumps({"sweep": "bloom_semi", "copies": copies,
                          "rows_in": n_od, "rows_out": n, "sec": round(dt, 2)}))

        if copies <= 4:
            li = replicate(li0, "l_orderkey", copies)
            edges = replicate(od0, "o_orderkey", copies).join(
                li, F.col("o_orderkey") == F.col("l_orderkey")
            ).select(
                F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
                F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
            )
            n_e = edges.count()
            dt, n = timed(
                lambda: label_propagation(
                    edges, iterations=2, broadcast_labels=True
                ).count()
            )
            print(json.dumps({"sweep": "label_prop", "copies": copies,
                              "rows_in": n_e, "rows_out": n,
                              "sec": round(dt, 2)}))


if __name__ == "__main__":
    main()
