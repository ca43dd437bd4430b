"""Streaming exact dedup: drop duplicate documents as they arrive.

Batch dedup answers "which of these N docs are duplicates"; a
continuous ingestion pipeline needs "have I seen this doc before".
Spark's stateful ``dropDuplicates`` over the canonical fingerprint is
exactly that; the watermark bounds how long fingerprints are retained
(state eviction), trading late-duplicate detection for bounded state —
at 100 TB/day the fingerprint store is the only state, 16 bytes a doc.
Works identically on a batch frame (plain dropDuplicates, no state).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.llm.textstats import doc_fingerprint

__all__ = ["dedup_stream"]


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Keep the first-seen row per canonical-text fingerprint.

    Streaming: pass ``ts_col`` + ``watermark`` (e.g. ``"1 hour"``) so
    fingerprint state older than the watermark is evicted; duplicates
    arriving later than that are no longer detected — the documented,
    bounded-state trade. Batch: both may stay None.

    Batch ``dropDuplicates`` keeps an *arbitrary* row per key; pass
    ``order_col`` (batch only) to keep the minimum-``order_col`` row
    instead — the deterministic replay of "first seen" that an
    oracle can check. One shuffle either way; the window variant's
    ``rank <= 1`` filter is pushed map-side by WindowGroupLimit.
    """
    out = df.withColumn("__ks_fp__", doc_fingerprint(text_col))
    if watermark is not None:
        if ts_col is None:
            raise ValueError("watermark requires ts_col")
        if order_col is not None:
            raise ValueError(
                "order_col is batch-only; streaming state keeps the "
                "first-arrived row per fingerprint, so a deterministic "
                "min-order_col pick is not available under a watermark"
            )
        out = out.withWatermark(ts_col, watermark)
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: plain
        # dropDuplicates only evicts state when the event-time column
        # is part of the dedup subset — deduping on the fingerprint
        # alone would grow one state row per distinct document forever
        # (the bounded-state contract above would be false). The
        # WithinWatermark variant evicts fingerprint state once it
        # ages past the watermark, which is exactly the documented
        # trade.
        return out.dropDuplicatesWithinWatermark(["__ks_fp__"]).drop(
            "__ks_fp__"
        )
    if order_col is not None:
        w = Window.partitionBy("__ks_fp__").orderBy(order_col)
        return (
            out.withColumn("__ks_rn__", F.row_number().over(w))
            .where(F.col("__ks_rn__") == 1)
            .drop("__ks_fp__", "__ks_rn__")
        )
    return out.dropDuplicates(["__ks_fp__"]).drop("__ks_fp__")
