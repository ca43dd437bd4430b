#!/usr/bin/env python
"""Local mirror of the driver's CORRECTNESS harness.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` entry via tests/oracle.compare (rows, schema,
order-insensitive values). Deliberately does NOT pre-set
``spark.sql.legacy.parquet.nanosAsLong`` — the driver's session doesn't,
so this proves read_table is self-sufficient on the nanos parquet.

Usage: python scripts/correctness_local.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as entry_mod
    from tests.oracle import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-local")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[1:])

    n_ok = n_fail = n_rowsonly = 0
    for i, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            if name not in oracles:
                n = df.count()
                n_rowsonly += 1
                print(f"[{i:2d}] {name}: rows-only ({n} rows) "
                      f"{time.perf_counter() - t0:.1f}s")
                continue
            ok, msg = compare(df, oracles[name], SF_DIR)
        except Exception:
            ok, msg = False, traceback.format_exc(limit=3)
        dt = time.perf_counter() - t0
        if ok:
            n_ok += 1
            print(f"[{i:2d}] {name}: OK {dt:.1f}s")
        else:
            n_fail += 1
            print(f"[{i:2d}] {name}: FAIL {dt:.1f}s\n      {msg}")
    print(f"\nok={n_ok} fail={n_fail} rows_only={n_rowsonly}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
