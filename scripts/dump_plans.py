#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named registry queries.

Usage:
  python scripts/dump_plans.py <repo_path> <out_dir> <suffix> q1 q2 ...

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query, built from
the ``__spark_entry__`` at <repo_path> (point it at a pinned worktree
for the _before side). sf dir: $SPARK_GRAFT_SF_DIR (default sf0.1) —
the same data the bench times, so plan shapes match the bench claims.
"""

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    os.chdir(repo)
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(path, len(plan.splitlines()), "lines")
    spark.stop()


if __name__ == "__main__":
    main()
