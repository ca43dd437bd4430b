"""As-of join — backward point-in-time semantics, checked against a
hand-computed golden and (in the oracle suite) DuckDB's native ASOF JOIN."""

import datetime as dt

import pyspark.sql.functions as F

from kolang_spark.operators.asof import as_of_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_as_of_join_backward_golden(spark):
    left = spark.createDataFrame(
        [("a", _ts(5)), ("a", _ts(10)), ("a", _ts(2)), ("b", _ts(7))],
        "k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts(3), 30.0), ("a", _ts(10), 100.0), ("b", _ts(9), 90.0)],
        "k string, ts timestamp, price double",
    )
    out = {
        (r["k"], r["ts"].minute): r["price"]
        for r in as_of_join(left, right, on=["k"]).collect()
    }
    assert out == {
        ("a", 5): 30.0,    # most recent right at-or-before :05 is :03
        ("a", 10): 100.0,  # equal timestamps match
        ("a", 2): None,    # nothing at-or-before :02
        ("b", 7): None,    # b's only right row is later
    }


def test_as_of_join_tolerance(spark):
    left = spark.createDataFrame([("a", _ts(30))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(0), 1.0)], "k string, ts timestamp, v double"
    )
    loose = as_of_join(left, right, on=["k"]).first()["v"]
    tight = as_of_join(
        left, right, on=["k"], tolerance=F.expr("INTERVAL 10 MINUTES")
    ).first()["v"]
    assert loose == 1.0 and tight is None


def test_as_of_join_name_collision_suffix(spark):
    left = spark.createDataFrame([("a", _ts(5), 1.0)], "k string, ts timestamp, v double")
    right = spark.createDataFrame([("a", _ts(1), 2.0)], "k string, ts timestamp, v double")
    out = as_of_join(left, right, on=["k"])
    assert out.columns == ["k", "ts", "v", "v_right"]
    row = out.first()
    assert row["v"] == 1.0 and row["v_right"] == 2.0
