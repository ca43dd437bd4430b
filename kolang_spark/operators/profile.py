"""One-pass table profiling: per-column count / nulls / distinct /
min / max — the data-quality sweep run before pointing a training
pipeline at a new source.

Scale shape: ONE aggregation job for the whole profile. Every metric is
an aggregate expression in a single ``agg`` (count and min/max combine
map-side; with ``exact_distinct=False`` — the 100 TB default posture —
distinct uses HyperLogLog++ sketches, also map-side mergeable, so the
shuffle carries one partial-agg row per partition regardless of table
width). The wide single-row result is reshaped to one row per column
with ``stack`` — driver-side metadata work, no second pass over data.

``exact_distinct=True`` switches to ``count(DISTINCT col)`` per column:
engine-exact (DuckDB-oracle-comparable) but each distinct adds an
``Expand`` duplication of the scan rows — use at validation scale.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregation
    pass.

    Returns one row per column: ``(column, n_rows, n_null, n_distinct,
    min_value, max_value)`` with min/max rendered as strings (profiles
    mix types; casting to a common surface keeps the output one frame).
    NULLs don't count toward ``n_distinct`` (Spark and ANSI semantics).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    missing = set(cols) - set(df.columns)
    if missing:
        raise ValueError(f"unknown columns: {sorted(missing)}")
    if not cols:
        raise ValueError("no columns to profile")
    # names flow into the stack() SQL string below — a quote/backtick
    # would silently misparse there, so fail loudly instead
    bad = [c for c in cols if "`" in c or "'" in c or "\n" in c]
    if bad:
        raise ValueError(
            f"column names with quotes/backticks are not supported: {bad!r}"
        )

    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__null_{c}__"))
        aggs.append(
            (
                F.count_distinct(col)
                if exact_distinct
                else F.approx_count_distinct(col)
            ).alias(f"__dist_{c}__")
        )
        aggs.append(F.min(col).cast("string").alias(f"__min_{c}__"))
        aggs.append(F.max(col).cast("string").alias(f"__max_{c}__"))
    one = df.agg(*aggs)

    # wide single row → long: stack is a per-row expression over the
    # 1-row aggregate result (metadata-scale work)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.extend(
            [f"`__null_{c}__`", f"`__dist_{c}__`", f"`__min_{c}__`", f"`__max_{c}__`"]
        )
    stacked = one.select(
        F.col("__n__").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_null", "n_distinct", "min_value", "max_value"
    )
