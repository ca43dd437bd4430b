"""Fluent accessor layer — chaining equivalence with the plain functions."""

import pyspark.sql.functions as F

import kolang_spark as ks
from kolang_spark.accessors import kl


def test_kl_chain_matches_plain_functions(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(1, 5)], "k int, v long")
    chained = (
        kl(df)
        .percent("v", r=None, out="pct")
        .cumulative_sum("v", "k", out="cum")
        .df
    )
    plain = df.withColumn("pct", ks.percent("v", r=None)).withColumn(
        "cum", ks.cumulative_sum("v", "k")
    )
    assert sorted(map(tuple, chained.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_kl_delegates_to_dataframe(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v long")
    out = kl(df).percent("v", r=None).where(F.col("k") == 2)
    # .where fell through to the plain DataFrame
    assert out.count() == 1


def test_kl_union_all_mixes_wrappers(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([("s",)], "y string")
    out = kl(a).union_all(kl(b)).df
    assert out.count() == 2
    assert out.columns == ["x", "y"]


def test_count_distinct_with_nulls_approx_close(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(500)] + [(None,)], "v int")
    exact = df.agg(ks.count_distinct_with_nulls("v").alias("n")).first()["n"]
    approx = df.agg(
        ks.count_distinct_with_nulls("v", exact=False).alias("n")
    ).first()["n"]
    assert exact == 51
    assert abs(approx - exact) <= 5


def test_accessor_dataframe_operator_passthroughs(spark):
    import datetime as dt

    from kolang_spark.accessors import kl

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0, 15), float(v)) for v in range(8)],
        "g string, ts timestamp, v double",
    )
    assert kl(df).top_k_per_group("g", "v", 3).df.count() == 3
    out = kl(df).mad_outliers("v", by=["g"]).df
    assert {"group_median", "mad", "abs_dev", "is_outlier"} <= set(out.columns)
    assert kl(df).equi_depth_bin("v", n_bins=4).df.count() == 8
    rs = kl(df).resample_fill("ts", "v", "1 hour", by=["g"]).df
    assert {"bucket_ts", "value", "is_filled"} <= set(rs.columns)
    assert kl(df).zorder_by(["v"], bits=2).df.count() == 8


def test_accessor_round6_operators(spark):
    from kolang_spark.accessors import kl

    df = spark.createDataFrame(
        [(i, "k", float(i)) for i in range(8)], "doc_id long, k string, v double"
    )
    assert "v_w" in kl(df).winsorize("v", lower=0.1, upper=0.9, by=["k"]).df.columns
    assert "v_std" in kl(df).standardize("v", by=["k"]).df.columns
    assert "zorder_key" in kl(df).with_zorder_key(["v"], bits=2).df.columns
    packed = kl(df.selectExpr("doc_id", "v as tok").selectExpr("doc_id", "CAST(tok AS LONG) tok")).pack_examples(
        tokens_col="tok", example_tokens=4
    ).df
    assert {"token_offset", "first_example"} <= set(packed.columns)
    binned = kl(
        df.selectExpr("doc_id", "CAST(v AS LONG) tok")
    ).pack_balanced(tokens_col="tok", n_bins=2).df
    assert {"pack_rank", "bin_id"} <= set(binned.columns)
