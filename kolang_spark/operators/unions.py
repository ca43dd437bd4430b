"""n-ary union-by-name over mismatched schemas with deterministic
type/column reconciliation.

Parity: ``/root/reference/kolang/dataframe_functions.py`` D4
(``union_all``, :155-221) and D5 (``safe_union``, :224-254).

The reference fills missing columns with NULL on each side, then uses a
``try/except AnalysisException`` retry with a hard-coded cast table —
i.e. analysis errors as control flow. That is fragile across Spark
versions (verified drift on Spark 4: ``unionByName(bool, string)`` no
longer raises and silently coerces). Here reconciliation is **up-front
and deterministic**: target schema is computed from all inputs before
any union is built, so behavior is identical on every Spark version.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["union_all", "safe_union"]

# numeric widening lattice (index = wins)
_NUMERIC_ORDER = ["tinyint", "smallint", "int", "bigint", "float", "double"]

# pairs the reference force-casts (dataframe_functions.py:207-210), kept
# and extended with a general "anything + string → string" rule
_FORCE_TO_STRING = {"boolean", "string", "array<string>"}


def _target_type(types: List[str], force: bool) -> Optional[str]:
    """Pick the reconciled simpleString type for one column, or None to
    leave Spark's own unionByName coercion alone."""
    distinct = sorted(set(t for t in types if t != "void"))
    if len(distinct) <= 1:
        return None
    if all(t in _NUMERIC_ORDER for t in distinct):
        return max(distinct, key=_NUMERIC_ORDER.index)
    # numeric + string → string matches the reference's verified no-force
    # behavior (docstring dataframe_functions.py:170-187: col4 long vs
    # string unions to string)
    if "string" in distinct and all(
        t in _NUMERIC_ORDER or t == "string" for t in distinct
    ):
        return "string"
    if force and "string" in distinct:
        # force path: boolean/array<string>/anything + string → string
        return "string"
    return None


def union_all(*dfs: Union[DataFrame, List[DataFrame]], force: bool = False) -> DataFrame:
    """Union any number of DataFrames by column name, reconciling
    missing columns (filled with typed NULLs) and, under ``force=True``,
    incompatible column types (cast toward string / widest numeric).

    Output column order is deterministic: first-seen order across the
    argument list (the reference's ``set`` algebra made it random per
    process).

    Scale: unions are metadata-only (no shuffle); a flat n-ary
    ``unionByName`` chain keeps the plan a single ``Union`` node that AQE
    can coalesce, instead of the reference's recursive pairwise nesting.
    """
    if len(dfs) == 1 and isinstance(dfs[0], list):
        dfs = tuple(dfs[0])
    if not dfs:
        raise ValueError("union_all needs at least one DataFrame")
    if len(dfs) == 1:
        return dfs[0]

    # first-seen global column order
    all_cols: List[str] = []
    for df in dfs:
        for c in df.columns:
            if c not in all_cols:
                all_cols.append(c)

    # reconcile types per column
    types_by_col: Dict[str, List[str]] = {c: [] for c in all_cols}
    for df in dfs:
        schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for c in all_cols:
            if c in schema:
                types_by_col[c].append(schema[c])

    casts = {c: _target_type(ts, force) for c, ts in types_by_col.items()}

    aligned = []
    for df in dfs:
        have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        cols = []
        for c in all_cols:
            if c in have:
                col = F.col(c)
                if casts[c] is not None and have[c] != casts[c]:
                    col = col.cast(casts[c])
            else:
                target = casts[c] or next(iter(types_by_col[c]), "string")
                col = F.lit(None).cast(target)
            cols.append(col.alias(c))
        aligned.append(df.select(*cols))

    out = aligned[0]
    for df in aligned[1:]:
        out = out.unionByName(df)
    return out


def safe_union(*dfs: Union[DataFrame, List[DataFrame]]) -> DataFrame:
    """``union_all(..., force=True)`` — parity with reference D5."""
    return union_all(*dfs, force=True)
