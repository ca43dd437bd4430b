"""Snapshot diffing and slowly-changing-dimension (type 2) history.

Warehouse-side change-data tooling: diff two snapshots of a keyed
table (what a CDC feed would have emitted), and fold a sequence of
snapshots into an SCD2 dimension with validity intervals. No
counterpart exists in the reference (`/root/reference/kolang` has no
versioned-table surface) — extension surface for the analytics
mandate; the semantics follow Kimball's public type-2 dimension
convention.

Determinism contract: row comparison is NULL-safe equality per column
(`<=>`), change classification is pure set algebra on the key, and the
caller supplies the integer version stamp — output is a pure function
of the inputs, so an SQL oracle replays it exactly with FULL OUTER
JOINs.

Scale shape: each diff is ONE full-outer shuffle join on the key —
both sides hash-partition on the same key, so the join co-locates
without extra movement, and AQE converts it to broadcast when one
snapshot is small. Column comparison is a row-local expression (no
second pass). ``scd2_apply`` is one diff join plus one fate join plus
a union; the ``is_current`` filter prunes closed history from both
joins (it pushes to the dimension scan), so applying a snapshot costs
O(|current| + |snapshot|) regardless of how deep the history is.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff", "scd2_init", "scd2_apply"]

_SCD_COLS = ("valid_from", "valid_to", "is_current")


def _compare_cols(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Optional[Sequence[str]],
) -> list:
    cols = (
        list(compare)
        if compare is not None
        else [c for c in new.columns if c not in set(keys)]
    )
    for side, df in (("old", old), ("new", new)):
        absent = [c for c in list(keys) + cols if c not in df.columns]
        if absent:
            raise ValueError(
                f"{side} snapshot lacks columns {absent}; pass "
                "compare_cols explicitly for schema-evolving snapshots"
            )
    return cols


def _key_cond(left: DataFrame, right: DataFrame, keys: Sequence[str]):
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return cond


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table → one row per key present in
    either side: the keys, ``change_type`` ∈ {'insert','delete',
    'update','unchanged'}, and the surviving attribute values (new side
    for insert/update/unchanged, old side for delete).

    Keys must be unique within each snapshot (the standard CDC
    contract); duplicate keys make the full-outer join fan out and the
    diff meaningless — validate upstream with ``exact_dedup`` if
    unsure. Comparison is NULL-safe per column: NULL → NULL is
    unchanged, NULL → value is an update.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    cols = _compare_cols(old, new, keys, compare_cols)

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}__") for k in keys],
        *[F.col(c).alias(f"__o_{c}__") for c in cols],
        F.lit(1).alias("__in_old__"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}__") for k in keys],
        *[F.col(c).alias(f"__n_{c}__") for c in cols],
        F.lit(1).alias("__in_new__"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}__").eqNullSafe(F.col(f"__nk_{k}__"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    changed = F.lit(False)
    for c in cols:
        changed = changed | ~F.col(f"__o_{c}__").eqNullSafe(F.col(f"__n_{c}__"))
    change_type = (
        F.when(F.col("__in_old__").isNull(), F.lit("insert"))
        .when(F.col("__in_new__").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = [
        F.coalesce(F.col(f"__nk_{k}__"), F.col(f"__ok_{k}__")).alias(k)
        for k in keys
    ]
    out.append(change_type.alias("change_type"))
    for c in cols:
        out.append(
            F.when(F.col("__in_new__").isNotNull(), F.col(f"__n_{c}__"))
            .otherwise(F.col(f"__o_{c}__"))
            .alias(c)
        )
    return j.select(*out)


def scd2_init(
    snapshot: DataFrame, keys: Sequence[str], version: int
) -> DataFrame:
    """Seed an SCD2 dimension from the first snapshot: every row
    becomes current with ``valid_from = version``, ``valid_to = NULL``,
    ``is_current = true``. ``version`` is an integer the caller stamps
    batches with (batch sequence number, epoch day, …) and must
    strictly increase across ``scd2_apply`` calls."""
    if not keys:
        raise ValueError("keys must be non-empty")
    clash = [c for c in snapshot.columns if c in _SCD_COLS]
    if clash:
        raise ValueError(f"snapshot columns clash with SCD bookkeeping: {clash}")
    return snapshot.select(
        *snapshot.columns,
        F.lit(int(version)).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    version: int,
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fold ``snapshot`` (stamped ``version``) into an SCD2 dimension
    produced by ``scd2_init`` / previous ``scd2_apply`` calls.

    Kimball type-2 semantics:

    - unchanged current rows pass through untouched;
    - updated keys: the old current row closes (``valid_to = version``,
      ``is_current = false``) and a new current row opens at
      ``valid_from = version``;
    - deleted keys: the current row closes, nothing opens;
    - inserted keys (including keys re-appearing after a delete): a new
      current row opens;
    - already-closed history rows pass through untouched.

    The function is a pure transformation (no side effects); the caller
    owns persisting each fold (e.g. via ``overwrite_partitions``).
    """
    missing = [c for c in _SCD_COLS if c not in dim.columns]
    if missing:
        raise ValueError(
            f"dim lacks SCD bookkeeping columns {missing} — seed with scd2_init"
        )
    attr_cols = [c for c in dim.columns if c not in _SCD_COLS]
    cur = dim.where(F.col("is_current"))
    closed = dim.where(~F.col("is_current"))

    d = snapshot_diff(
        cur.select(*attr_cols), snapshot, keys, compare_cols=compare_cols
    )
    fate = d.select(*keys, "change_type")
    v = F.lit(int(version)).cast("long")

    # old current rows keep their own valid_from; fate decides whether
    # they stay open. Every current key appears in the diff (full
    # outer), so the left join never misses.
    cur_fated = cur.join(fate, _key_cond(cur, fate, keys), "left").select(
        *[cur[c] for c in attr_cols],
        cur["valid_from"],
        F.col("change_type"),
    )
    kept = cur_fated.where(F.col("change_type") == "unchanged").select(
        *attr_cols,
        "valid_from",
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closing = cur_fated.where(
        F.col("change_type").isin("update", "delete")
    ).select(
        *attr_cols,
        "valid_from",
        v.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new rows come from the snapshot itself (it carries every attr
    # even when compare_cols narrows the change test)
    snap_fated = snapshot.join(
        fate, _key_cond(snapshot, fate, keys), "left"
    ).select(*[snapshot[c] for c in attr_cols], F.col("change_type"))
    opening = snap_fated.where(
        F.col("change_type").isin("insert", "update")
    ).select(
        *attr_cols,
        v.alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.select(*kept.columns).unionByName(
        kept.unionByName(closing).unionByName(opening)
    )
