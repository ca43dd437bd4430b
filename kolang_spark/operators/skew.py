"""Skew mitigation: salted joins and shuffle-safe distinct counting.

At 100 TB a handful of hot keys (the null user, the default product,
the crawler-duplicated URL) can pin an entire join or distinct-count on
one reducer. AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``)
handles sort-merge joins automatically; these operators cover the cases
it cannot: pre-aggregation key explosion for ``count_distinct`` and
joins whose skew AQE misses or that feed windowed logic downstream.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["salted_join", "skew_safe_distinct_count"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt: int = 16,
    salt_by: Optional[Column] = None,
) -> DataFrame:
    """Equi-join where hot keys on the ``big`` side are spread over
    ``salt`` shuffle partitions.

    The big side gets a salt in ``[0, salt)`` per row; the small side is
    replicated once per salt value (an inline ``explode`` — cost is
    ``salt × |small|``, the price of eliminating the hot-key reducer).
    The join key becomes ``(on…, salt)``, so each hot key's rows split
    across ``salt`` reducers instead of one.

    ``salt_by`` sets the salt deterministically from an existing
    row-varying column (``pmod(xxhash64(col), salt)``); default is
    ``rand(seed=0)`` — any row→salt assignment is correct, it only
    shapes partitioning. Supported ``how``: inner / left (replicating
    the small side would duplicate its unmatched rows under right/full).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in ('inner', 'left')")
    if salt < 2:
        raise ValueError("salt must be >= 2")

    salt_col = (
        F.pmod(F.xxhash64(salt_by), F.lit(salt)).cast("int")
        if salt_by is not None
        else F.floor(F.rand(seed=0) * salt).cast("int")
    )
    big_s = big.withColumn("__ks_salt__", salt_col)
    small_s = small.withColumn(
        "__ks_salt__", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [*on, "__ks_salt__"], how).drop("__ks_salt__")


def skew_safe_distinct_count(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    value: ColumnOrName,
    out: str = "n_distinct",
) -> DataFrame:
    """``count_distinct(value)`` per key group without funneling every
    distinct value of a hot key through one reducer.

    Two exact phases: (1) ``groupBy(keys, value)`` — the *pair* key is
    high-cardinality, so it spreads evenly regardless of key skew, and
    map-side partial aggregation collapses duplicates before the
    shuffle; (2) ``groupBy(keys).count()`` over the already-distinct
    pairs. Identical result to ``count_distinct`` (NULL values excluded,
    matching its semantics).
    """
    key_cols: List[Column] = [to_col(k) for k in keys]
    v = to_col(value)
    pairs = (
        df.where(v.isNotNull())
        .select(*key_cols, v.alias("__ks_v__"))
        .distinct()
    )
    return pairs.groupBy(*[to_col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias(out)
    )


def skew_report(
    df: DataFrame,
    keys: Sequence[ColumnOrName],
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight skew diagnostic for a join/aggregation key: the
    ``top_k`` heaviest key tuples with their row counts, share of the
    table, and ``skew_factor`` = count / (total / n_distinct_keys) —
    a key at factor ~1 is uniform; factors in the hundreds mean the
    planned equi-join needs :func:`salted_join` or AQE skew handling.
    Run it BEFORE the expensive job: one map-side-combinable groupBy +
    a distributed ``TakeOrdered`` top-k (never a global window) + a
    broadcast 1-row totals join. Ties break on the key values, so the
    report is deterministic.

    NULL keys are real groups and report like any other (a NULL-heavy
    join key is one of the most common skew sources).
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    key_cols: List[Column] = [to_col(k) for k in keys]
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__ks_total__"),
        F.count(F.lit(1)).alias("__ks_nkeys__"),
    )
    top = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(c) for c in counts.columns[:-1]]
    ).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *counts.columns[:-1],
            "n_rows",
            (100.0 * F.col("n_rows") / F.col("__ks_total__")).alias("share_pct"),
            (
                F.col("n_rows")
                / (F.col("__ks_total__") / F.col("__ks_nkeys__"))
            ).alias("skew_factor"),
        )
    )
