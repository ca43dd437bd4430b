"""Vocabulary builder and int8 embedding quantization."""

import numpy as np

import pytest
from pyspark.sql import functions as F

from kolang_spark.llm.quantize import dequantize_embedding, quantize_embedding
from kolang_spark.llm.terms import vocabulary


def test_vocabulary_counts_and_order(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "The dog and the cat"),
        (3, "mat mat mat"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = vocabulary(df, max_size=10, min_df=1).collect()
    stats = {r.term: (r.tf, r.df_term) for r in out}
    assert stats["the"] == (4, 2)  # lowercased; 2 in each of docs 1+2
    assert stats["mat"] == (4, 2)  # within-doc repeats all count
    assert stats["cat"] == (2, 2)
    # ordering: tf desc then term asc ('mat' < 'the' at tf tie 4)
    assert [r.term for r in out[:2]] == ["mat", "the"]
    # min_df filter
    v2 = {r.term for r in vocabulary(df, max_size=10, min_df=2).collect()}
    assert v2 == {"the", "mat", "cat"}
    # max_size truncates deterministically
    assert vocabulary(df, max_size=2, min_df=1).count() == 2
    with pytest.raises(ValueError):
        vocabulary(df, max_size=0)
    with pytest.raises(ValueError):
        vocabulary(df, min_df=0)


def test_vocabulary_case_knob(spark):
    df = spark.createDataFrame([(1, "A a A b")], ["doc_id", "text"])
    cased = {r.term: r.tf for r in vocabulary(df, lowercase=False).collect()}
    assert cased == {"A": 2, "a": 1, "b": 1}


def test_quantize_roundtrip_error_bound(spark):
    """|v - dequant(quant(v))| <= scale/2 per element; codes span
    [-127, 127] with the max-abs element hitting ±127 exactly."""
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16).astype(np.float32)])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes, scale = quantize_embedding(F.col("embedding"))
    q = df.select("vec_id", "embedding", codes.alias("c"), scale.alias("s"))
    got = q.withColumn("r", dequantize_embedding("c", "s")).collect()
    for row in got:
        assert max(abs(c) for c in row.c) == 127
        assert all(-127 <= c <= 127 for c in row.c)
        for v, r in zip(row.embedding, row.r):
            assert abs(v - r) <= row.s / 2 + 1e-12
    # numpy reference parity on the codes
    for row in got:
        v = np.asarray(row.embedding, dtype=np.float64)
        ma = np.abs(v).max()
        expect = np.round(v * 127 / ma).astype(int)
        assert list(expect) == list(row.c)


def test_quantize_degenerate_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.5, -3.0])], "vec_id long, embedding array<float>"
    )
    codes, scale = quantize_embedding(F.col("embedding"))
    got = {
        r.vec_id: r
        for r in df.select("vec_id", codes.alias("c"), scale.alias("s")).collect()
    }
    assert got[1].c == [0, 0] and got[1].s == 0.0
    assert got[2].c == [64, -127]  # round(1.5*127/3) = round(63.5) = 64
    with pytest.raises(ValueError):
        quantize_embedding(F.col("embedding"), out_bits=1)


def test_quantize_bits_knob(spark):
    df = spark.createDataFrame([(1, [1.0, -0.5])], "vec_id long, embedding array<float>")
    codes, _ = quantize_embedding(F.col("embedding"), out_bits=4)
    assert df.select(codes.alias("c")).first().c == [7, -4]  # qmax = 7
