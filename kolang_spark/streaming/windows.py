"""Event-time window aggregation: tumbling / sliding, batch + streaming.

Extension surface (the reference is batch-only — SURVEY §2.3
"Streaming": tumbling/sliding/watermark support is listed as entirely
absent there). Built on native ``F.window``, which produces the same
plan shape on a batch DataFrame and a streaming one; on a stream, pass
``watermark`` so state is evicted and late data beyond the bound is
dropped.

Scale posture: windowed aggregation is a hash shuffle on
``(keys, window)`` with map-side partial aggregation — fully parallel,
no global ordering. Windows are epoch-aligned (Spark aligns to
1970-01-01 UTC), so results are engine-portable.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["tumbling", "sliding"]


def _windowed(
    df: DataFrame,
    ts: ColumnOrName,
    duration: str,
    slide: Optional[str],
    keys: Sequence[ColumnOrName],
    aggs: Optional[Dict[str, Column]],
    watermark: Optional[str],
) -> DataFrame:
    if watermark is not None and not isinstance(ts, str):
        # withWatermark takes a column NAME; materialize a Column-valued
        # ts (the old `else "ts"` fallback watermarked an unrelated
        # column, or raised, whenever ts was an expression)
        df = df.withColumn("__ks_ts__", to_col(ts))
        ts = "__ks_ts__"
    if watermark is not None:
        df = df.withWatermark(ts, watermark)
    if not aggs:
        aggs = {"n_events": F.count(F.lit(1))}
    win = (
        F.window(to_col(ts), duration)
        if slide is None
        else F.window(to_col(ts), duration, slide)
    )
    key_cols = [to_col(k) for k in keys]
    out = df.groupBy(win.alias("window"), *key_cols).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    # re-select by the aggregated frame's own column names — selecting
    # the original key EXPRESSIONS would break for non-trivial Columns
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def tumbling(
    df: DataFrame,
    ts: ColumnOrName = "ts",
    duration: str = "1 hour",
    keys: Sequence[ColumnOrName] = (),
    aggs: Optional[Dict[str, Column]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Non-overlapping event-time windows of ``duration``.

    ``aggs`` maps output name → aggregate Column (default: event count).
    Batch: plain groupBy. Streaming: stateful windowed aggregation —
    pass ``watermark`` (required for append-mode sinks).
    """
    return _windowed(df, ts, duration, None, keys, aggs, watermark)


def sliding(
    df: DataFrame,
    ts: ColumnOrName = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: Sequence[ColumnOrName] = (),
    aggs: Optional[Dict[str, Column]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Overlapping event-time windows: ``duration`` long, advancing by
    ``slide``. Each event lands in ``duration/slide`` windows (Spark
    expands it to one row per containing window before aggregation)."""
    return _windowed(df, ts, duration, slide, keys, aggs, watermark)
