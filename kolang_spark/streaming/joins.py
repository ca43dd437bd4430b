"""Event-time interval (stream-stream) joins.

Extension surface: the reference has no streaming at all (SURVEY §2.3),
and its batch joins are plain equi-joins. Spark's Structured Streaming
supports joining two STREAMS when both sides carry watermarks and the
join condition bounds event time — this module packages that contract
so the same call works identically on batch frames (where it's an
equi-join plus a time-range filter) and on streaming frames (where the
time bound + watermarks let Spark evict join state).

Scale posture: the join is an equi-join on the keys (hash-partitioned,
AQE-skew-splittable); the interval condition is a post-join filter
Spark pushes into the join. State on streams is bounded by
``watermark`` + the interval width — without both, a stream-stream
join would buffer forever (Spark rejects it).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    watermark: Optional[str] = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows with equal ``keys`` whose event times satisfy
    ``right_ts ∈ [left_ts + lower, left_ts + upper]`` (``lower`` may be
    negative, e.g. ``'-10 minutes'``, for a look-back window).

    Works identically on batch and streaming inputs; for
    stream-stream, pass ``watermark`` (applied to both sides) — Spark
    requires it to bound join state, and late rows beyond it are
    dropped. ``how`` supports the Spark stream-stream set (inner, and
    outer variants when watermarked).

    Output carries every left column plus the right columns, with the
    right side's key and timestamp columns renamed to ``r_<name>``.
    For inner/left joins the ``r_<key>`` copies are dropped (equal to
    the left keys wherever present). For right/full-outer joins the
    key columns are COALESCED into the left-named keys first — a
    right-only row's keys would otherwise be dropped with the
    ``r_<key>`` copy, leaving the row with no key at all.
    """
    if not keys:
        raise ValueError("keys must name at least one join column")
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    renames = {k: f"r_{k}" for k in (*keys, right_ts)}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    l_, r_ = left.alias("l"), r.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.r_{k}")
        cond = c if cond is None else (cond & c)
    rts = F.col(f"r.r_{right_ts}")
    lts = F.col(f"l.{left_ts}")
    cond = (
        cond
        & (rts >= lts + F.expr(f"INTERVAL {lower}"))
        & (rts <= lts + F.expr(f"INTERVAL {upper}"))
    )
    joined = l_.join(r_, cond, how)
    if how.replace("_", "").lower() in ("rightouter", "right", "fullouter", "full", "outer"):
        for k in keys:
            joined = joined.withColumn(
                k, F.coalesce(F.col(f"l.{k}"), F.col(f"r.r_{k}"))
            )
    return joined.drop(*[f"r_{k}" for k in keys])
