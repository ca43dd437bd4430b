"""Wide↔long reshaping: unpivot (melt) and transpose.

Parity: ``/root/reference/kolang/dataframe_functions.py`` D1
(``unpivot``, :15-93) and D3 (``transpose``, :137-152).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unpivot", "transpose"]


def unpivot(
    df: DataFrame,
    on_columns: List[str],
    in_column: str,
    value_column: str = "value",
    ignore_null: bool = True,
) -> DataFrame:
    """Melt ``on_columns`` into (``in_column``, ``value_column``) rows.

    Parity: reference D1 builds a SQL ``stack(...)`` expression and
    selects the id columns via Python ``set`` difference — which makes
    the id-column order non-deterministic and breaks on numeric column
    names (its docstring warns about both). Here:

    * the Spark ≥3.4 built-in :meth:`DataFrame.unpivot` is used (native
      ``Expand`` node — one scan, no self-union);
    * id-column order is the *original DataFrame order* (deterministic);
    * arbitrary column names are fine (no string-pasted SQL).

    Scale: ``Expand`` multiplies rows by ``len(on_columns)`` before the
    filter; with ``ignore_null=True`` the filter lands right above the
    scan and AQE coalesces the output — no shuffle is introduced.
    """
    id_cols = [c for c in df.columns if c not in set(on_columns)]
    out = df.unpivot(
        ids=id_cols,
        values=list(on_columns),
        variableColumnName=in_column,
        valueColumnName=value_column,
    )
    if ignore_null:
        out = out.where(F.col(value_column).isNotNull())
    return out


def transpose(
    df: DataFrame,
    col: str,
    max_rows: int = 10_000,
    native: bool = False,
) -> DataFrame:
    """Transpose a *small* DataFrame around ``col``.

    Parity: reference D3 (driver ``toPandas`` round-trip; its docstring
    warns "Dont use it for big DataFrames!!"). Deviations:

    * a hard ``max_rows`` guard (the reference will happily OOM the
      driver) — raises ``ValueError`` beyond it;
    * the former column names come back in an ``index`` column, matching
      the reference's verified output shape;
    * ``native=True`` uses Spark 4's built-in :meth:`DataFrame.transpose`
      (JVM-side, no pandas round-trip), with its ``key`` column renamed
      to ``index`` for shape parity. Behavior difference, on purpose:
      the built-in coerces all value columns to their least common type
      (ints become doubles when mixed), where the pandas path preserves
      per-cell values through object dtype. Default stays the
      reference-parity path.

    A transpose is inherently schema-explosive (output schema = input
    rows); both paths are intentionally NOT distributed and guarded.
    """
    n = df.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"transpose is driver-side; refusing {n}+ rows (max_rows={max_rows})"
        )
    if native:
        out = df.transpose(col)
        return out.withColumnRenamed("key", "index")
    pdf = df.toPandas().set_index(col).transpose().reset_index()
    pdf.columns = [str(c) for c in pdf.columns]
    from kolang_spark.sources.io import pandas_to_spark

    return pandas_to_spark(pdf, spark=df.sparkSession)
