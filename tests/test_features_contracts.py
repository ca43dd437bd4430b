"""trailing_window_agg (`operators/features.py`), cusum_shift
(`operators/anomaly.py`), validate (`operators/contracts.py`), and
bloom_semi_join (`operators/sketches.py`): spec replicas and edge
cases."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from kolang_spark.operators.anomaly import cusum_shift
from kolang_spark.operators.contracts import (
    accepted_values,
    in_range,
    matches_regex,
    not_null,
    unique,
    validate,
)
from kolang_spark.operators.features import trailing_window_agg
from kolang_spark.operators.sketches import bloom_semi_join


# ---------- trailing_window_agg ----------


def test_trailing_window_counts_and_sums(spark):
    rows = [
        (1, 0, 10), (1, 500, 20), (1, 1000, 30), (1, 2500, 40),
        (2, 0, 5),
    ]
    df = spark.createDataFrame(rows, "uid long, ts_ms long, cents long")
    out = {
        (r["uid"], r["ts_ms"]): (r["n_1000ms"], r["sum_1000ms"])
        for r in trailing_window_agg(
            df, ["uid"], windows_ms=[1000], value_col="cents"
        ).collect()
    }
    # frame is [ts-1000, ts] inclusive
    assert out[(1, 0)] == (1, 10)
    assert out[(1, 500)] == (2, 30)
    assert out[(1, 1000)] == (3, 60)   # 0 is still inside [0, 1000]
    assert out[(1, 2500)] == (1, 40)
    assert out[(2, 0)] == (1, 5)


def test_trailing_window_tie_inclusive(spark):
    df = spark.createDataFrame(
        [(1, 100, 1), (1, 100, 2), (1, 100, 4)], "uid long, ts_ms long, c long"
    )
    out = trailing_window_agg(df, ["uid"], windows_ms=[50], value_col="c")
    # RANGE frames include ALL peers at the same timestamp for every row
    assert sorted((r["n_50ms"], r["sum_50ms"]) for r in out.collect()) == [
        (3, 7), (3, 7), (3, 7)
    ]


def test_trailing_window_multiple_windows_one_pass(spark):
    df = spark.createDataFrame(
        [(1, i * 1000, 1) for i in range(5)], "uid long, ts_ms long, c long"
    )
    out = trailing_window_agg(df, ["uid"], windows_ms=[1000, 3000])
    r = {x["ts_ms"]: (x["n_1000ms"], x["n_3000ms"]) for x in out.collect()}
    assert r[4000] == (2, 4)
    assert r[0] == (1, 1)


# ---------- cusum_shift ----------


def _cusum_replica(xs, ref, side="high"):
    s, out = 0, []
    for x in xs:
        d = (x - ref) if side == "high" else (ref - x)
        s = max(0, s + d)
        out.append(s)
    return out


@pytest.mark.parametrize("side", ["high", "low"])
def test_cusum_matches_recursion(spark, side):
    xs = [5, 7, 4, 12, 15, 3, 2, 9, 20, 1]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "t long, v long"
    )
    got = [
        r["cusum"]
        for r in cusum_shift(df, "t", "v", reference=6, side=side)
        .orderBy("t")
        .collect()
    ]
    assert got == _cusum_replica(xs, 6, side)


def test_cusum_alarm_and_groups(spark):
    rows = [("a", 0, 10), ("a", 1, 10), ("b", 0, 0), ("b", 1, 0)]
    df = spark.createDataFrame(rows, "g string, t long, v long")
    out = {
        (r["g"], r["t"]): (r["cusum"], r["alarm"])
        for r in cusum_shift(
            df, "t", "v", by=["g"], reference=5, threshold=7
        ).collect()
    }
    assert out[("a", 0)] == (5, False)
    assert out[("a", 1)] == (10, True)
    assert out[("b", 0)] == (0, False)
    assert out[("b", 1)] == (0, False)


def test_cusum_rejects_duplicate_ts(spark):
    df = spark.createDataFrame([(1, 1), (1, 2)], "t long, v long")
    with pytest.raises(Exception, match="duplicate timestamp"):
        cusum_shift(df, "t", "v").collect()


# ---------- validate (data contracts) ----------


def test_validate_report(spark):
    rows = [
        (1, "a@x.io", "US", 10.0),
        (2, None, "US", 200.0),
        (2, "b@y.io", "ZZ", -5.0),
        (None, "c", "FR", 50.0),
    ]
    df = spark.createDataFrame(rows, "id long, email string, cc string, amt double")
    rep = {
        r["check"]: r
        for r in validate(
            df,
            [
                not_null("id"),
                unique(["id"]),
                in_range("amt", 0.0, 100.0),
                accepted_values("cc", ["US", "FR"]),
                matches_regex("email", r"^[^@]+@[^@]+$"),
            ],
        ).collect()
    }
    assert all(r["n_rows"] == 4 for r in rep.values())
    assert rep["not_null"]["n_violations"] == 1
    # ids (non-null): 1, 2, 2 → 3 rows, 2 distinct → 1 surplus
    assert rep["unique"]["n_violations"] == 1
    assert rep["in_range[0.0,100.0]"]["n_violations"] == 2  # 200, -5
    assert rep["accepted_values"]["n_violations"] == 1  # ZZ
    assert rep["matches_regex"]["n_violations"] == 1  # "c"
    assert not any(r["passed"] for r in rep.values())


def test_validate_all_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    rep = validate(df, [not_null("id"), unique(["id"])]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep)


def test_validate_unique_multi_col_ignores_null_rows(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, None), (1, None)], "a long, b string"
    )
    rep = validate(df, [unique(["a", "b"])]).collect()[0]
    # only the two fully-non-null rows count: 2 rows, 1 distinct → 1
    assert rep["n_violations"] == 1


# ---------- bloom_semi_join ----------


def test_bloom_semi_join_exact_matches_plain_semi(spark):
    large = spark.createDataFrame([(i,) for i in range(200)], "k long")
    small = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "k long")
    got = sorted(r["k"] for r in bloom_semi_join(large, small, "k").collect())
    want = sorted(
        r["k"] for r in large.join(small, "k", "left_semi").collect()
    )
    assert got == want


def test_bloom_anti_join_matches_plain_anti_with_nulls(spark):
    large = spark.createDataFrame(
        [(i,) for i in range(50)] + [(None,)], "k long"
    )
    small = spark.createDataFrame([(i,) for i in range(0, 50, 5)], "k long")
    got = sorted(
        (r["k"] is None, r["k"] or 0)
        for r in bloom_semi_join(large, small, "k", anti=True).collect()
    )
    want = sorted(
        (r["k"] is None, r["k"] or 0)
        for r in large.join(small, "k", "left_anti").collect()
    )
    assert got == want


def test_bloom_semi_join_inexact_superset(spark):
    large = spark.createDataFrame([(i,) for i in range(500)], "k long")
    small = spark.createDataFrame([(i,) for i in range(0, 500, 50)], "k long")
    loose = {
        r["k"]
        for r in bloom_semi_join(
            large, small, "k", n_bits=256, k=2, exact=False
        ).collect()
    }
    exact = {r["k"] for r in large.join(small, "k", "left_semi").collect()}
    assert exact <= loose  # no false negatives, ever


def test_bloom_anti_requires_exact(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="exact"):
        bloom_semi_join(df, df, "k", anti=True, exact=False)


def test_bloom_semi_join_different_key_names(spark):
    large = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    small = spark.createDataFrame([(2,), (9,)], "ok long")
    got = sorted(
        r["k"] for r in bloom_semi_join(large, small, "k", right_key="ok").collect()
    )
    assert got == [2]


def test_bloom_semi_join_rejects_type_mismatch(spark):
    # regression: int-vs-double keys would coerce in a plain join but
    # hash to different Bloom bits — a silent false negative
    large = spark.createDataFrame([(5.0,), (7.0,)], "k double")
    small = spark.createDataFrame([(5,), (6,)], "k int")
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_semi_join(large, small, "k")
    # cast upstream and it works, matching the coercing plain join
    got = bloom_semi_join(
        large, small.select(F.col("k").cast("double").alias("k")), "k"
    ).collect()
    assert [r["k"] for r in got] == [5.0]
