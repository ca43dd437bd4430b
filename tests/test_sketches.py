"""Mergeable sketches: merge-consistency (the property that makes them
scale), estimate accuracy vs exact, and quantile sanity."""

import pyspark.sql.functions as F
import pytest

from kolang_spark.operators.sketches import (
    approx_quantiles,
    hll_estimate,
    hll_merge,
    hll_sketch,
    sketch_rollup,
)
from kolang_spark.sources.io import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    ).cache()


def test_merged_daily_equals_direct_total(spark, events):
    """merge(day sketches) must estimate EXACTLY what one direct sketch
    over the whole table estimates — HLL union is loss-free at equal
    precision. This is the invariant that lets a pipeline keep daily
    sketches and answer any rollup later without raw re-scans."""
    daily = events.groupBy("day").agg(hll_sketch("user_id").alias("sk"))
    merged = daily.agg(hll_estimate(hll_merge("sk")).alias("est")).first()["est"]
    direct = events.agg(hll_estimate(hll_sketch("user_id")).alias("est")).first()[
        "est"
    ]
    assert merged == direct


def test_estimate_within_tolerance_of_exact(spark, events):
    exact = events.select("user_id").distinct().count()
    est = events.agg(hll_estimate(hll_sketch("user_id")).alias("e")).first()["e"]
    assert abs(est - exact) / exact < 0.05  # lg_k=12 → ~1.6% typical


def test_sketch_rollup_matches_manual_two_level(spark, events):
    ev = events.withColumn("month", F.trunc("day", "month"))
    out = sketch_rollup(
        ev,
        "user_id",
        fine_keys=["month", "day"],
        coarse_keys=["month"],
    )
    rows = {r["month"]: r["n_distinct_est"] for r in out.collect()}
    direct = {
        r["month"]: r["e"]
        for r in ev.groupBy("month")
        .agg(hll_estimate(hll_sketch("user_id")).alias("e"))
        .collect()
    }
    assert rows == direct  # two-level merge == one-level direct


def test_sketch_rollup_validates_keys(spark, events):
    with pytest.raises(ValueError, match="not in fine_keys"):
        sketch_rollup(events, "user_id", ["day"], ["month"])


def test_approx_quantiles_ordered_and_bracket_median(spark, events):
    q = events.agg(
        approx_quantiles("value", (0.1, 0.5, 0.9)).alias("qs")
    ).first()["qs"]
    assert q[0] <= q[1] <= q[2]
    exact_med = events.agg(F.median("value")).first()[0]
    assert q[0] <= exact_med <= q[2]
