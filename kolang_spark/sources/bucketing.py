"""Bucketed tables: shuffle-free co-located joins.

The 100 TB pattern for a fact table repeatedly joined on the same key:
write it bucketed (and sorted) by that key once, and every subsequent
equi-join against another table bucketed the same way runs with **no
shuffle exchange** — each task merge-joins bucket *i* of both sides
straight off the scan. One write-time shuffle is traded for zero
join-time shuffles forever after.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "assert_no_shuffle_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    mode: str = "overwrite",
    format: str = "parquet",  # noqa: A002
) -> None:
    """Save ``df`` as a bucketed (optionally sorted) table.

    Bucketing metadata lives in the session catalog (``saveAsTable`` is
    required — plain ``.parquet(path)`` cannot record buckets). Pass
    ``path`` to make it an external table at an explicit location.
    ``num_buckets`` should be sized so one bucket of the *larger* table
    fits an executor task comfortably (at 100 TB: thousands, not 32).
    """
    w = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def assert_no_shuffle_join(joined: DataFrame) -> None:
    """Raise if the physical plan shuffles before joining — the check
    that two bucketed tables actually joined co-located. (Sorts are
    allowed: unsorted buckets still need a per-bucket sort for SMJ.)"""
    from kolang_spark.plans.audit import explain_str

    plan = explain_str(joined, mode="simple")
    # match SHUFFLE exchanges only: a bare "Exchange" substring test
    # also hits "BroadcastExchange", which involves no shuffle and is a
    # perfectly good plan for a small bucketed side
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    ]
    if shuffles:
        raise AssertionError(
            "bucketed join still shuffles — bucket counts/keys mismatch?\n" + plan
        )
