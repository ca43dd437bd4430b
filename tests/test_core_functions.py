"""Golden tests for core column operators — fixtures derive from the
reference's executable docstring examples (FIXTURES.md §A)."""

import pyspark.sql.functions as F
import pytest

import kolang_spark as ks


def rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).collect()]


def test_percent_of_total(spark):
    df = spark.range(1, 5).toDF("count").withColumn("percent", ks.percent("count"))
    got = dict(rows(df, "count", "percent"))
    assert got == {1: 10.0, 2: 20.0, 3: 30.0, 4: 40.0}


def test_percent_partitioned(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 5), ("b", 15)], ["k", "v"]
    ).withColumn("p", ks.percent("v", partition_by="k"))
    got = {(r.k, r.v): r.p for r in df.collect()}
    assert got == {("a", 1): 25.0, ("a", 3): 75.0, ("b", 5): 25.0, ("b", 15): 75.0}


def test_median_grouped(spark):
    df = spark.range(0, 34, 3).toDF("value").withColumn("even", F.col("value") % 2 == 0)
    out = df.groupBy("even").agg(ks.median("value"))
    got = dict(rows(out, "even", "median(value)"))
    assert got == {True: 15.0, False: 18.0}


def test_median_accepts_column(spark):
    df = spark.range(1, 6).toDF("v")
    (val,) = df.agg(ks.median(F.col("v")).alias("m")).first()
    assert val == 3.0


def test_cumulative_sum(spark):
    df = spark.range(0, 5).toDF("id").withColumn("value", F.lit(3))
    df = df.withColumn("cs", ks.cumulative_sum("value", "id"))
    assert dict(rows(df, "id", "cs")) == {0: 3, 1: 6, 2: 9, 3: 12, 4: 15}


def test_cumulative_sum_range_ties(spark):
    # RANGE frame: rows tied on the order column all get the full tied sum
    df = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], ["k", "v"])
    df = df.withColumn("cs", ks.cumulative_sum("v", "k"))
    got = sorted(rows(df, "k", "v", "cs"))
    assert got == [(1, 10, 30), (1, 20, 30), (2, 5, 35)]


def test_cumulative_sum_descending(spark):
    df = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["o", "v"])
    df = df.withColumn("cs", ks.cumulative_sum("v", "o", ascending=False))
    assert dict(rows(df, "o", "cs")) == {3: 3, 2: 5, 1: 6}


def test_cumulative_percent(spark):
    df = spark.range(0, 5).toDF("id").withColumn("value", F.lit(3))
    df = df.withColumn("cp", ks.cumulative_percent("value", "id"))
    assert dict(rows(df, "id", "cp")) == {0: 20.0, 1: 40.0, 2: 60.0, 3: 80.0, 4: 100.0}


def test_cond_count(spark):
    df = spark.range(0, 10).toDF("x")
    out = df.agg(
        ks.cond_count(F.col("x") > 6).alias("c1"),
        ks.cond_count("x % 2 = 0").alias("c2"),
    ).first()
    assert (out.c1, out.c2) == (3, 5)


def test_weighted_average(spark):
    df = spark.createDataFrame([(1.0, 1.0), (3.0, 3.0)], ["v", "w"])
    (out,) = df.agg(ks.weighted_average("v", "w").alias("wa")).first()
    assert out == pytest.approx(2.5)
    (out_r,) = df.agg(ks.weighted_average("v", "w", r=1).alias("wa")).first()
    assert out_r == 2.5


def test_count_distinct_with_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (None,)], "x int")
    (out,) = df.agg(ks.count_distinct_with_nulls("x").alias("c")).first()
    assert out == 2
    df2 = spark.createDataFrame([(1,), (2,), (3,)], "x int")
    (out2,) = df2.agg(ks.count_distinct_with_nulls("x").alias("c")).first()
    assert out2 == 3


def test_bin(spark):
    df = spark.createDataFrame([(7,), (15,), (26,)], "x int")
    assert dict(rows(df.withColumn("b", ks.bin("x")), "x", "b")) == {7: 0, 15: 10, 26: 20}
    got = dict(rows(df.withColumn("b", ks.bin("x", flooring=False)), "x", "b"))
    assert got == {7: 10.0, 15: 20.0, 26: 30.0}


def test_sum_columns_golden(spark):
    df = (
        spark.range(0, 5).toDF("a")
        .withColumn("b", F.lit(3))
        .withColumn("c", F.col("a") * 2)
        .withColumn("d", F.lit(123))
        .withColumn("e", F.col("a") + 2)
        .withColumn("f", F.col("a") * 3 + 2)
        .withColumn("g", F.lit(12))
        .withColumn("h", F.lit(-100))
        .withColumn("i", F.col("a") * -12)
    )
    df = df.withColumn(
        "sum", ks.sum_columns(["a", F.col("b"), "c", "d", "e", "f", "g", "h", "i"])
    )
    assert dict(rows(df, "a", "sum")) == {0: 42, 1: 37, 2: 32, 3: 27, 4: 22}


def test_sum_columns_null_propagation(spark):
    df = spark.createDataFrame([(1, None), (2, 3)], ["a", "b"])
    got = rows(df.withColumn("s", ks.sum_columns(["a", "b"])), "a", "s")
    assert sorted(got, key=lambda t: t[0]) == [(1, None), (2, 5)]
    got2 = rows(
        df.withColumn("s", ks.sum_columns(["a", "b"], ignore_nulls=True)), "a", "s"
    )
    assert sorted(got2, key=lambda t: t[0]) == [(1, 1), (2, 5)]


def test_moving_average_modes(spark):
    df = spark.createDataFrame([(i, v) for i, v in enumerate([0, 10, 20, 30, 40])], ["o", "v"])
    center = dict(rows(df.withColumn("m", ks.moving_average("v", "o", 3)), "o", "m"))
    assert center == {0: 5.0, 1: 10.0, 2: 20.0, 3: 30.0, 4: 35.0}
    prev = dict(rows(df.withColumn("m", ks.moving_average("v", "o", 3, mode="previous")), "o", "m"))
    assert prev == {0: 0.0, 1: 5.0, 2: 10.0, 3: 20.0, 4: 30.0}
    nxt = dict(rows(df.withColumn("m", ks.moving_average("v", "o", 3, mode="next")), "o", "m"))
    assert nxt == {0: 10.0, 1: 20.0, 2: 30.0, 3: 35.0, 4: 40.0}


def test_cube_percent(spark):
    base = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 3), ("b", "x", 4)], ["k1", "k2", "v"]
    )
    cubed = base.cube("k1", "k2").agg(F.sum("v").alias("v"))
    out = cubed.withColumn("pct", ks.cube_percent("v", ["k1", "k2"]))
    got = {(r.k1, r.k2): r.pct for r in out.collect()}
    # detail rows sum to 100
    assert got[("a", "x")] == 12.5
    assert got[("a", "y")] == 37.5
    assert got[("b", "x")] == 50.0
    # grand-total row = 100% of gated denominator
    assert got[(None, None)] == 100.0


def test_array_contains_column(spark):
    df = spark.createDataFrame(
        [
            ("xyzz", ["xyc", "hello"]),
            ("bye", ["kdf", "bye"]),
            ("b", ["b", "bye"]),
            ("hello", ["sd", "sds"]),
        ],
        ["word", "words"],
    )
    got = [r.word for r in df.filter(ks.array_contains_column("word", "words")).collect()]
    assert sorted(got) == ["b", "bye"]


def test_is_null_or_in(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "x int")
    got = [r.x for r in df.filter(ks.is_null_or_in("x", 2, 5)).collect()]
    assert sorted(got, key=lambda v: (v is None, v)) == [2, None]


def test_core_ops_stay_udf_free(spark):
    from kolang_spark.plans import has_python_eval

    df = (
        spark.range(0, 100)
        .toDF("id")
        .withColumn("v", F.col("id") * 2)
        .withColumn("p", ks.percent("v", partition_by=F.col("id") % 3))
        .withColumn("cs", ks.cumulative_sum("v", "id", partition_by=F.col("id") % 3))
    )
    assert not has_python_eval(df)


def test_quantiles_exact_and_approx(spark):
    df = spark.range(1, 101).toDF("v").withColumn("g", F.col("v") % 2 == 0)
    out = df.groupBy("g").agg(ks.quantiles("v", [0.0, 0.5, 1.0]).alias("q"))
    got = {r.g: r.q for r in out.collect()}
    # odds 1..99: min 1, median 50th value interp -> 50.0? (49 elems + interp)
    assert got[False][0] == 1.0 and got[False][2] == 99.0
    assert got[True][0] == 2.0 and got[True][2] == 100.0
    # approx path returns same cardinality, plausible values
    (qa,) = df.agg(ks.quantiles("v", [0.25, 0.75], exact=False).alias("q")).first()
    assert len(qa) == 2 and 20 <= qa[0] <= 30 and 70 <= qa[1] <= 80
    with pytest.raises(ValueError):
        ks.quantiles("v", [])
    with pytest.raises(ValueError):
        ks.quantiles("v", [1.5])
