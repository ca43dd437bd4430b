"""100-TB-scale rewrites of the global-window operators.

The reference computes grand totals and running totals with **empty
partition specs** (``Window.partitionBy()`` / global ``orderBy``) —
physically a single-partition ``WindowExec`` through which the entire
dataset must pass (SURVEY §4: the #1 scalability hazard). These
DataFrame-level variants produce the same values with distributed plans:

* :func:`with_percent` — grand total via a 1-row aggregate broadcast
  cross-join (map-side-combinable partial aggregation; no sort, no
  single-partition exchange).
* :func:`with_cumulative_sum` — two-pass bucketed prefix sum: a
  within-bucket RANGE window (distributed by bucket) plus broadcast
  per-bucket offsets. Identical values to a global RANGE cumulative sum
  whenever ``bucket`` is a function of ``order_col`` (ties cannot span
  buckets).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.utils import (
    ColumnOrName,
    broadcast_join_nullsafe,
    to_col,
    to_col_list,
)

__all__ = ["with_percent", "with_cumulative_sum"]


def with_percent(
    df: DataFrame,
    col: ColumnOrName,
    partition_by: Union[ColumnOrName, Sequence[ColumnOrName], None] = None,
    out: str = "percent",
    r: Optional[int] = 2,
) -> DataFrame:
    """Same values as ``withColumn(out, percent(col, partition_by, r))``
    but with no single-partition window when ``partition_by`` is None.

    Plan: ``Aggregate(sum)`` (partial+final, a few rows) →
    ``BroadcastExchange`` → ``BroadcastNestedLoopJoin`` over 1 row —
    every stage fully parallel.
    """
    c = to_col(col)
    parts = to_col_list(partition_by)
    if parts:
        w = Window.partitionBy(*parts)
        expr = 100 * c / F.sum(c).over(w)
        return df.withColumn(out, F.round(expr, r) if r is not None else expr)

    total = df.agg(F.sum(c).alias("__ks_total__"))
    expr = 100 * c / F.col("__ks_total__")
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn(out, F.round(expr, r) if r is not None else expr)
        .drop("__ks_total__")
    )


def with_cumulative_sum(
    df: DataFrame,
    col: ColumnOrName,
    order_col: ColumnOrName,
    bucket: Union[Column, str],
    partition_by: Union[str, Sequence[str], None] = None,
    out: str = "cumulative_sum",
) -> DataFrame:
    """Distributed running total of ``col`` ordered by ``order_col``.

    ``bucket`` must be a *monotone coarsening of* ``order_col`` (e.g.
    ``F.date_trunc('month', order_col)`` for a date order, or the id
    minus its remainder): equal ``order_col`` values must share a
    bucket AND bucket values must sort in the same (ascending) order
    as the ``order_col`` ranges they cover — the per-bucket offsets
    are accumulated in bucket order, so a non-monotone bucketing (a
    hash, say) would scramble the running totals. Any truncation/
    floor-style function satisfies both; RANGE-frame tie semantics
    are then preserved exactly. A NULL ``order_col`` yields the NULL
    bucket, which sorts first — the same NULLS FIRST position the
    plain window gives those rows.

    ``partition_by`` takes column *names* here (needed for the name-based
    equi-join of the offset table).

    Plan: window partitioned by (partition_by, bucket) — a normal hashed
    shuffle — plus a tiny per-bucket totals aggregate whose exclusive
    prefix (computed with a window over the *small* bucket table) is
    broadcast-joined back.
    """
    c = to_col(col)
    bucket_col = to_col(bucket) if isinstance(bucket, str) else bucket
    part_names = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    )

    tagged = df.withColumn("__ks_bucket__", bucket_col)

    w_in = (
        Window.partitionBy(*part_names, "__ks_bucket__")
        .orderBy(to_col(order_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.sum(c).over(w_in)

    totals = tagged.groupBy(*part_names, "__ks_bucket__").agg(
        F.sum(c).alias("__ks_bucket_total__")
    )
    w_off = (
        Window.partitionBy(*part_names)
        .orderBy("__ks_bucket__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *part_names,
        "__ks_bucket__",
        F.coalesce(F.sum("__ks_bucket_total__").over(w_off), F.lit(0)).alias(
            "__ks_offset__"
        ),
    )

    # NULL-safe re-attach: a NULL bucket (NULL order_col) or NULL
    # partition key is a real group; a plain equi-join would silently
    # drop those rows — the trap broadcast_join_nullsafe exists for
    return (
        broadcast_join_nullsafe(
            tagged, offsets, keys=[*part_names, "__ks_bucket__"]
        )
        .withColumn(out, within + F.col("__ks_offset__"))
        .drop("__ks_bucket__", "__ks_offset__")
    )
