"""Range (interval) joins without a cartesian product.

The reference has no join operators at all (SURVEY §2.3 — joins are
"delegated to Spark"), but Spark itself plans a raw range predicate
(``a.ts BETWEEN b.start AND b.end``) as a nested-loop/cartesian join —
the classic O(n·m) trap that a 100 TB event table cannot survive.

The fix is the standard bucketed-range-join rewrite (what Databricks
ships as a range-join *hint* and DuckDB as a native IEJoin): quantize
the range axis into fixed-width buckets, explode each interval onto
every bucket it covers, and equi-join on ``(equi keys…, bucket)`` with
the exact range predicate as a residual filter. The join becomes a
plain hash/sort-merge join — shuffle-partitioned, AQE-skew-splittable —
and the residual runs on same-bucket candidates only.

Cost model: with bucket width ~ the typical interval length, each
interval lands in ≤2 buckets and each candidate group is small; shuffle
volume is |points| + Σ(interval spans), not |points|·|intervals|.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["point_in_interval_join", "interval_overlap_join"]

_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _width_seconds(bucket: str | int) -> int:
    """``"10 minutes"`` → 600. Whole-second widths only (bucket
    boundaries then align with ``unix_timestamp`` truncation, so
    floor(trunc(ts)/w) == floor(ts/w))."""
    if isinstance(bucket, int):
        if bucket <= 0:
            raise ValueError("bucket width must be positive")
        return bucket
    m = re.fullmatch(r"\s*(\d+)\s+(\w+)\s*", bucket)
    if not m or m.group(2) not in _UNITS:
        raise ValueError(
            f"bucket must look like '10 minutes' (units: {sorted(_UNITS)}); got {bucket!r}"
        )
    return int(m.group(1)) * _UNITS[m.group(2)]


def _bucket_of(ts_col: str, width: int):
    return F.floor(F.unix_timestamp(F.col(ts_col)) / width)


def _check_disjoint(left: DataFrame, right: DataFrame) -> None:
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"range join requires disjoint column names; rename {sorted(overlap)}"
        )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: Optional[Sequence[tuple[str, str]]] = None,
    bucket: str | int = "10 minutes",
    end_inclusive: bool = True,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``on`` is a list of ``(point_col, interval_col)`` extra equi-keys
    (e.g. ``[("user_id", "i_user_id")]``) — range joins in practice are
    almost always keyed, and the keys join the shuffle partitioning.
    Column names of the two sides must be disjoint (pre-rename; the
    bucketing column is internal and dropped).

    Each point has exactly one bucket, so no pair is emitted twice and
    no post-join dedup is needed. Pick ``bucket`` ≈ the typical interval
    length: intervals explode onto span/width+1 buckets.
    """
    _check_disjoint(points, intervals)
    w = _width_seconds(bucket)
    pt = points.withColumn("__ks_bucket__", _bucket_of(point_ts, w))
    iv = intervals.withColumn(
        "__ks_bucket__",
        F.explode(
            F.sequence(_bucket_of(start_ts, w), _bucket_of(end_ts, w))
        ),
    )
    cond = [pt["__ks_bucket__"] == iv["__ks_bucket__"]] + [
        pt[a] == iv[b] for a, b in (on or [])
    ]
    upper = (
        F.col(point_ts) <= F.col(end_ts)
        if end_inclusive
        else F.col(point_ts) < F.col(end_ts)
    )
    return (
        pt.join(iv, cond)
        .where((F.col(point_ts) >= F.col(start_ts)) & upper)
        .drop("__ks_bucket__")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Optional[Sequence[tuple[str, str]]] = None,
    bucket: str | int = "10 minutes",
) -> DataFrame:
    """Join interval rows that overlap (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``).

    Both sides explode onto their covered buckets; a matching pair
    shares every bucket in the overlap, so to emit it exactly once the
    equi-join keeps only the *first* shared bucket —
    ``bucket == max(floor(l_start/w), floor(r_start/w))`` — a pure
    residual predicate, no dedup shuffle.
    """
    _check_disjoint(left, right)
    w = _width_seconds(bucket)
    lt = left.withColumn(
        "__ks_bucket__",
        F.explode(F.sequence(_bucket_of(left_start, w), _bucket_of(left_end, w))),
    )
    rt = right.withColumn(
        "__ks_bucket__",
        F.explode(F.sequence(_bucket_of(right_start, w), _bucket_of(right_end, w))),
    )
    cond = [lt["__ks_bucket__"] == rt["__ks_bucket__"]] + [
        lt[a] == rt[b] for a, b in (on or [])
    ]
    first_shared = F.greatest(
        F.floor(F.unix_timestamp(F.col(left_start)) / w),
        F.floor(F.unix_timestamp(F.col(right_start)) / w),
    )
    return (
        lt.join(rt, cond)
        .where(
            (F.col(left_start) <= F.col(right_end))
            & (F.col(right_start) <= F.col(left_end))
            & (lt["__ks_bucket__"] == first_shared)
        )
        .drop("__ks_bucket__")
    )
