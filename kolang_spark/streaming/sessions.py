"""Session windows — the streaming mirror of batch ``session_id``.

The reference's one streaming-shaped concept, sessionization
(``/root/reference/kolang/column_functions.py:280-308``), is batch-only.
This module exposes the same inactivity-gap semantics on Spark's native
``F.session_window``, which works identically on a batch DataFrame and a
streaming one (where it becomes a stateful operator with watermark-based
late-data handling and state eviction).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["sessionize"]


def sessionize(
    df: DataFrame,
    key: ColumnOrName = "user_id",
    ts: ColumnOrName = "ts",
    gap: str = "30 minutes",
    watermark: Optional[str] = None,
    value: Optional[ColumnOrName] = None,
) -> DataFrame:
    """Aggregate events into inactivity-gap sessions.

    Returns one row per (key, session) with ``session_start``,
    ``session_end``, ``n_events`` and (if ``value`` given) ``sum_value``.

    * Batch DataFrame → plain aggregation over ``F.session_window``.
    * Streaming DataFrame → pass ``watermark`` (e.g. ``"1 hour"``); it is
      applied to ``ts`` so state for closed sessions is evicted and late
      events beyond the watermark are dropped. Output mode must be
      ``append``/``update`` per Spark's stateful-agg rules.

    Scale: state is hash-partitioned by key; no global ordering anywhere.
    """
    if watermark is not None and not isinstance(ts, str):
        # withWatermark takes a column NAME; a Column-valued ts must be
        # materialized first (the old `else "ts"` fallback watermarked
        # an unrelated column, or raised, whenever ts was an expression)
        df = df.withColumn("__ks_ts__", to_col(ts))
        ts = "__ks_ts__"
    ts_col = to_col(ts)
    if watermark is not None:
        df = df.withWatermark(ts, watermark)

    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(to_col(value)).alias("sum_value"))

    win = F.session_window(ts_col, gap)
    return (
        df.groupBy(to_col(key).alias("key"), win)
        .agg(*aggs)
        .select(
            "key",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value is not None else []),
        )
    )
