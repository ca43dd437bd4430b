"""Sessionization by inactivity gap (batch).

Parity: ``session_id`` (``/root/reference/kolang/column_functions.py:
280-308``): per ``device_id``, ordered by epoch-millis ``created_at``, a
new session starts at the first event or when the gap since the previous
event exceeds ``session_time`` minutes.

The reference stamps sessions with ``monotonically_increasing_id`` and
forward-fills — **non-deterministic** (ids change run-to-run and after a
repartition; SURVEY §4). Here the id is a *deterministic* running count
of session starts per device, concatenated with the device id, so the
same input always yields the same ids on any cluster layout.

Streaming parity lives in :mod:`kolang_spark.streaming.sessions`
(``F.session_window`` + watermark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["session_id", "with_session_id"]


def session_id(
    device_id: ColumnOrName = "device_id",
    created_at: ColumnOrName = "created_at",
    session_time: int = 30,
) -> Column:
    """Deterministic session id column (``<device>-<n>`` string).

    ``created_at`` must be epoch **milliseconds** (long), matching the
    reference's contract (``column_functions.py:293-295``).

    Physical shape: one shuffle on ``device_id`` (hash-partitioned
    window) and a single sort per partition — the same cost as the
    reference, but with no non-deterministic id generation. Scales with
    the number of devices; no global window anywhere.
    """
    gap_ms = session_time * 60_000
    dev, ts = to_col(device_id), to_col(created_at)

    w = Window.partitionBy(dev).orderBy(ts)
    prev_ts = F.lag(ts).over(w)
    is_new = (prev_ts.isNull() | (ts - prev_ts > gap_ms)).cast("long")
    session_no = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.concat_ws("-", dev.cast("string"), session_no.cast("string"))


def with_session_id(
    df: DataFrame,
    device_id: ColumnOrName = "device_id",
    created_at: ColumnOrName = "created_at",
    session_time: int = 30,
    out: str = "session_id",
) -> DataFrame:
    """DataFrame-level convenience: ``df.withColumn(out, session_id(...))``."""
    return df.withColumn(out, session_id(device_id, created_at, session_time))
