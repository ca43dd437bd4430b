"""Bucketed range joins: equivalence with the naive theta join, exact
once-only pair emission, and the no-cartesian plan guarantee."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from kolang_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


@pytest.fixture(scope="module")
def points(spark):
    rows = [(i, i % 3, _ts(i * 7 % 120, i % 60)) for i in range(60)]
    return spark.createDataFrame(rows, "p_id long, p_key long, p_ts timestamp")


@pytest.fixture(scope="module")
def intervals(spark):
    # spans from 0 to 25 minutes: some inside one bucket, some crossing
    rows = [
        (j, j % 3, _ts(j * 11 % 100), _ts(j * 11 % 100 + (j % 5) * 5 + 1))
        for j in range(20)
    ]
    return spark.createDataFrame(
        rows, "i_id long, i_key long, i_start timestamp, i_end timestamp"
    )


def test_point_in_interval_matches_naive_theta_join(spark, points, intervals):
    got = point_in_interval_join(
        points,
        intervals,
        point_ts="p_ts",
        start_ts="i_start",
        end_ts="i_end",
        on=[("p_key", "i_key")],
        bucket="10 minutes",
    )
    naive = points.join(
        intervals,
        (points.p_key == intervals.i_key)
        & (points.p_ts >= intervals.i_start)
        & (points.p_ts <= intervals.i_end),
    )
    g = {(r.p_id, r.i_id) for r in got.collect()}
    n = {(r.p_id, r.i_id) for r in naive.collect()}
    assert g == n and len(g) > 0
    # once-only emission: no dedup was applied, so multiset == set
    assert got.count() == len(g)


def test_point_in_interval_exclusive_end(spark, points, intervals):
    incl = point_in_interval_join(
        points, intervals, "p_ts", "i_start", "i_end", bucket="5 minutes"
    )
    excl = point_in_interval_join(
        points,
        intervals,
        "p_ts",
        "i_start",
        "i_end",
        bucket="5 minutes",
        end_inclusive=False,
    )
    border = points.join(intervals, points.p_ts == intervals.i_end).count()
    assert incl.count() - excl.count() == border


def test_interval_overlap_matches_naive_and_emits_once(spark, intervals):
    other = intervals.select(
        F.col("i_id").alias("r_id"),
        F.col("i_key").alias("r_key"),
        F.col("i_start").alias("r_start"),
        F.col("i_end").alias("r_end"),
    )
    got = interval_overlap_join(
        intervals,
        other,
        "i_start",
        "i_end",
        "r_start",
        "r_end",
        on=[("i_key", "r_key")],
        bucket="10 minutes",
    )
    naive = intervals.join(
        other,
        (intervals.i_key == other.r_key)
        & (intervals.i_start <= other.r_end)
        & (other.r_start <= intervals.i_end),
    )
    g = [(r.i_id, r.r_id) for r in got.collect()]
    n = {(r.i_id, r.r_id) for r in naive.collect()}
    assert set(g) == n
    assert len(g) == len(n)  # first-shared-bucket residual dedups exactly


def test_no_cartesian_or_nested_loop_in_plan(spark, points, intervals):
    from kolang_spark.plans.audit import explain_str

    got = point_in_interval_join(
        points, intervals, "p_ts", "i_start", "i_end", bucket="10 minutes"
    )
    plan = explain_str(got, mode="simple")
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_overlapping_column_names_rejected(spark, points):
    with pytest.raises(ValueError, match="disjoint"):
        point_in_interval_join(points, points, "p_ts", "p_ts", "p_ts")


def test_bad_bucket_spec_rejected(spark, points, intervals):
    with pytest.raises(ValueError, match="bucket"):
        point_in_interval_join(
            points, intervals, "p_ts", "i_start", "i_end", bucket="ten mins"
        )
