"""join_key_profile + psi_drift (`operators/profile.py`): exact-count
spec checks including NULL keys, fanout, and PSI bin arithmetic."""

import math

import pytest
from pyspark.sql import functions as F

from kolang_spark.operators.profile import join_key_profile, psi_drift


def test_join_key_profile_counts(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k int"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (4,), (None,), (None,)], "k int"
    )
    r = join_key_profile(left, right, "k").collect()[0]
    assert r["n_left"] == 5 and r["n_right"] == 7
    assert r["null_left"] == 1 and r["null_right"] == 2
    assert r["distinct_left"] == 3 and r["distinct_right"] == 3
    assert r["keys_both"] == 2  # {1, 2}
    assert r["keys_left_only"] == 1  # {3}
    assert r["keys_right_only"] == 1  # {4}
    assert r["join_rows"] == 2 * 1 + 1 * 3  # k=1: 2×1, k=2: 1×3
    assert r["max_key_fanout"] == 3
    # the ground truth Spark itself would produce
    assert left.join(right, "k").count() == r["join_rows"]


def test_join_key_profile_disjoint_and_empty(spark):
    left = spark.createDataFrame([(1,)], "k int")
    right = spark.createDataFrame([(2,)], "k int")
    r = join_key_profile(left, right, "k").collect()[0]
    assert r["join_rows"] == 0 and r["max_key_fanout"] == 0
    assert r["keys_both"] == 0


def test_join_key_profile_different_key_names(spark):
    left = spark.createDataFrame([(1,), (2,)], "a int")
    right = spark.createDataFrame([(2,), (2,)], "b int")
    r = join_key_profile(left, right, "a", right_key="b").collect()[0]
    assert r["keys_both"] == 1 and r["join_rows"] == 2


def test_psi_drift_bins_and_terms(spark):
    ref = spark.createDataFrame([(float(v),) for v in [1, 2, 3, 11, 12, 25]], "v double")
    cur = spark.createDataFrame(
        [(float(v),) for v in [1, 11, 12, 13, 14, 25, 30, 31]], "v double"
    )
    out = {r["bin"]: r for r in psi_drift(ref, cur, "v", [10.0, 20.0]).collect()}
    assert (out[0]["n_ref"], out[0]["n_cur"]) == (3, 1)  # < 10
    assert (out[1]["n_ref"], out[1]["n_cur"]) == (2, 4)  # [10, 20)
    assert (out[2]["n_ref"], out[2]["n_cur"]) == (1, 3)  # >= 20
    # bin 1 term: p_ref=2/6, p_cur=4/8
    p_r, p_c = 2 / 6, 4 / 8
    assert out[1]["psi_term"] == pytest.approx((p_c - p_r) * math.log(p_c / p_r))
    assert out[0]["lo"] is None and out[0]["hi"] == 10.0
    assert out[2]["lo"] == 20.0 and out[2]["hi"] is None


def test_psi_drift_empty_bin_floor(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    cur = spark.createDataFrame([(99.0,), (98.0,)], "v double")
    out = {r["bin"]: r for r in psi_drift(ref, cur, "v", [50.0]).collect()}
    # ref entirely bin 0, cur entirely bin 1; empty shares floor at 1e-6
    t0 = (1e-6 - 1.0) * math.log(1e-6 / 1.0)
    assert out[0]["psi_term"] == pytest.approx(t0)
    assert out[0]["n_cur"] == 0 and out[1]["n_ref"] == 0


def test_psi_drift_identical_is_zero(spark):
    df = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    out = psi_drift(df, df, "v", [5.0, 10.0, 15.0]).agg(
        F.sum("psi_term").alias("psi")
    ).collect()[0]
    assert out["psi"] == pytest.approx(0.0, abs=1e-12)


def test_psi_drift_validates_edges(spark):
    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", [2.0, 1.0])
    with pytest.raises(ValueError):
        psi_drift(df, df, "v", [])
