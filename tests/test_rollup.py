"""Multi-granularity rollup: per-level equivalence with plain groupBy,
single-shuffle plan shape, and input validation."""

import pyspark.sql.functions as F
import pytest

from kolang_spark.operators.rollup import hypertable_rollup
from kolang_spark.sources.io import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").cache()


def _rollup(events):
    return hypertable_rollup(
        events,
        "ts",
        {"n_events": F.count(F.lit(1)), "sum_value": F.round(F.sum("value"), 2)},
        granularities=("hour", "day", "month"),
        keys=("event_type",),
    )


def test_each_level_matches_plain_groupby(spark, events):
    out = _rollup(events)
    for g in ("hour", "day", "month"):
        expected = (
            events.where(F.col("ts").isNotNull())
            .groupBy(
                F.date_trunc(g, "ts").alias("bucket_ts"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("sum_value"),
            )
        )
        got = {
            (r.bucket_ts, r.event_type): (r.n_events, r.sum_value)
            for r in out.where(F.col("granularity") == g).collect()
        }
        exp = {
            (r.bucket_ts, r.event_type): (r.n_events, r.sum_value)
            for r in expected.collect()
        }
        assert got == exp, f"granularity {g} mismatch"


def test_single_shuffle_single_scan(spark, events):
    from kolang_spark.plans.audit import explain_str

    plan = explain_str(_rollup(events), mode="simple")
    assert plan.count("Exchange") == 1  # one shuffle for all three levels
    assert plan.count("FileScan") <= 1
    assert "Expand" in plan  # grouping-set expansion, not a union of scans
    # partial aggregation runs before the exchange (map-side combine)
    assert plan.index("partial_count") > plan.index("Exchange")


def test_null_ts_rows_excluded(spark):
    df = spark.createDataFrame(
        [(None, "a", 1.0), ("2024-01-01 10:30:00", "a", 2.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hypertable_rollup(
        df, "ts", {"n": F.count(F.lit(1))}, granularities=("day",), keys=("k",)
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n"] == 1


def test_validation(spark, events):
    with pytest.raises(ValueError, match="unknown granularities"):
        hypertable_rollup(events, "ts", {"n": F.count(F.lit(1))}, ("fortnight",))
    with pytest.raises(ValueError, match="at least one aggregate"):
        hypertable_rollup(events, "ts", {})
