"""Embedding storage quantization: int8 scalar quantization per vector.

At 100 TB an fp32 embedding column is often the single largest field;
symmetric int8 quantization cuts it 4x with ~0.2% cosine error, and a
per-vector scale keeps outlier vectors from clipping everyone else.
Pure Column algebra (array HOFs), no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kolang_spark.utils import ColumnOrName, to_col

__all__ = ["quantize_embedding", "dequantize_embedding"]


def quantize_embedding(
    col: ColumnOrName, out_bits: int = 8
) -> tuple[Column, Column]:
    """Symmetric per-vector scalar quantization of a float array
    column: returns ``(codes, scale)`` where ``codes[i] =
    round(v[i] * qmax / max_abs)`` (``qmax = 2^(bits-1) - 1``, so int8
    codes span [-127, 127]) and ``scale = max_abs / qmax`` reconstructs
    ``v[i] ~ codes[i] * scale``.

    Deterministic and engine-portable: ``max_abs`` is an exact float
    max, and the quantizer is one double multiply + divide + round per
    element — the same IEEE operations in any engine evaluating the
    same expression shape. All-zero (or empty) vectors get
    ``scale = 0`` and all-zero codes rather than a division by zero.
    """
    if not 2 <= out_bits <= 16:
        raise ValueError("out_bits must be in 2..16")
    qmax = (1 << (out_bits - 1)) - 1
    v = to_col(col)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    codes = F.when(
        max_abs > 0,
        F.transform(
            v,
            lambda x: F.round(x.cast("double") * qmax / max_abs).cast("int"),
        ),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    scale = F.when(max_abs > 0, max_abs / qmax).otherwise(F.lit(0.0))
    return codes, scale


def dequantize_embedding(
    codes: ColumnOrName, scale: ColumnOrName
) -> Column:
    """Reconstruct the float vector: ``codes[i] * scale`` (double)."""
    s = to_col(scale)
    return F.transform(to_col(codes), lambda c: c.cast("double") * s)
