"""correlation_matrix + grouped_ols (`operators/stats.py`) and
attribute_conversions (`operators/attribution.py`): numpy/spec
replicas and degenerate cases."""

import math

import pytest
from pyspark.sql import functions as F

from kolang_spark.operators.attribution import attribute_conversions
from kolang_spark.operators.stats import correlation_matrix, grouped_ols


def test_correlation_matrix_vs_numpy(spark):
    import numpy as np

    rows = [
        (1.0, 2.0, 5.0),
        (2.0, 4.1, 4.0),
        (3.0, 5.9, 3.5),
        (4.0, 8.2, 1.0),
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    m = np.array(rows)
    assert got[("a", "b")] == pytest.approx(np.corrcoef(m[:, 0], m[:, 1])[0, 1])
    assert got[("a", "c")] == pytest.approx(np.corrcoef(m[:, 0], m[:, 2])[0, 1])
    assert got[("b", "c")] == pytest.approx(np.corrcoef(m[:, 1], m[:, 2])[0, 1])


def test_correlation_pairwise_nulls_and_degenerate(spark):
    rows = [(1.0, 1.0, 7.0), (2.0, None, 7.0), (3.0, 3.0, 7.0)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {
        (r["col_a"], r["col_b"]): (r["n"], r["corr"])
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == (2, pytest.approx(1.0))  # NULL row excluded
    assert got[("a", "c")][0] == 3 and got[("a", "c")][1] is None  # c flat


def test_grouped_ols_vs_numpy(spark):
    import numpy as np

    rows = [("g", float(x), 3.0 * x + 1.0 + (0.1 if x == 2 else 0.0))
            for x in range(5)] + [("h", 0.0, 9.9), ("h", 1.0, 7.7)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in grouped_ols(df, "x", "y", by=["g"]).collect()}
    xs = np.array([r[1] for r in rows if r[0] == "g"])
    ys = np.array([r[2] for r in rows if r[0] == "g"])
    slope, intercept = np.polyfit(xs, ys, 1)
    assert got["g"]["slope"] == pytest.approx(slope)
    assert got["g"]["intercept"] == pytest.approx(intercept)
    assert got["g"]["r2"] == pytest.approx(np.corrcoef(xs, ys)[0, 1] ** 2)
    assert got["h"]["slope"] == pytest.approx(-2.2)


def test_grouped_ols_degenerate(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 5.0), ("b", 2.0, 1.0), ("b", 2.0, 9.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in grouped_ols(df, "x", "y", by=["g"]).collect()}
    assert got["a"]["slope"] is None  # n=1
    assert got["b"]["slope"] is None  # zero x-variance


def test_attribution_last_and_first_touch(spark):
    rows = [
        (1, 0, "ad"), (1, 1, "email"), (1, 2, "buy"),
        (1, 3, "ad"), (1, 4, "buy"),
        (2, 0, "buy"),  # no prior touch → NULL
    ]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    last = {
        (r["uid"], r["t"]): r["attributed"]
        for r in attribute_conversions(
            df, ["uid"], "t", "s", ["buy"]
        ).collect()
    }
    assert last == {(1, 2): "email", (1, 4): "ad", (2, 0): None}
    first = {
        (r["uid"], r["t"]): r["attributed"]
        for r in attribute_conversions(
            df, ["uid"], "t", "s", ["buy"], model="first_touch"
        ).collect()
    }
    assert first == {(1, 2): "ad", (1, 4): "ad", (2, 0): None}


def test_attribution_touch_whitelist_and_conv_not_touch(spark):
    # an earlier conversion never gets credit; non-whitelisted states
    # are transparent
    rows = [(1, 0, "buy"), (1, 1, "spam"), (1, 2, "ad"), (1, 3, "buy")]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    got = {
        r["t"]: r["attributed"]
        for r in attribute_conversions(
            df, ["uid"], "t", "s", ["buy"], touch_states=["ad", "email"]
        ).collect()
    }
    assert got == {0: None, 3: "ad"}


def test_attribution_rejects_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, "ad"), (1, 5, "buy")], "uid long, t long, s string"
    )
    with pytest.raises(Exception, match="tied"):
        attribute_conversions(df, ["uid"], "t", "s", ["buy"]).collect()


def test_attribution_same_ts_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5, 0, "ad"), (1, 5, 1, "buy")], "uid long, t long, i long, s string"
    )
    got = attribute_conversions(
        df, ["uid"], "t", "s", ["buy"], order_cols=["i"]
    ).collect()
    assert got[0]["attributed"] == "ad"


def test_attribution_tie_between_touches_raises(spark):
    # regression: the tie guard must fire even when the tied rows are
    # NON-conversion rows (the conversion filter used to be pushed
    # below the raise projection, silently skipping the check)
    df = spark.createDataFrame(
        [(1, 50, "email"), (1, 50, "ad"), (1, 200, "buy")],
        "uid long, t long, s string",
    )
    with pytest.raises(Exception, match="tied"):
        attribute_conversions(df, ["uid"], "t", "s", ["buy"]).collect()


def test_attribution_tie_in_conversionless_series_is_benign(spark):
    # ties in a series that never converts cannot corrupt output (no
    # rows emitted from it) — other series still work
    df = spark.createDataFrame(
        [(1, 50, "ad"), (1, 50, "email"), (2, 10, "ad"), (2, 20, "buy")],
        "uid long, t long, s string",
    )
    got = attribute_conversions(df, ["uid"], "t", "s", ["buy"]).collect()
    assert [(r["uid"], r["attributed"]) for r in got] == [(2, "ad")]


def test_correlation_matrix_rejects_quoted_names(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    df = df.withColumnRenamed("a", "it's")
    with pytest.raises(ValueError, match="quotes"):
        correlation_matrix(df, ["it's", "b"])
