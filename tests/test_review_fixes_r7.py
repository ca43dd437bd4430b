"""Regression tests for the round-7 deep-review fixes: NULL handling in
the hash samplers and the bucketed cumulative sum, pre-epoch Jalali
arithmetic, Column-valued event-time watermarks, and outer interval
joins."""

import pytest
from pyspark.sql import functions as F


def test_deterministic_sample_keeps_null_keys_at_full_fraction(spark):
    from kolang_spark.operators.sampling import deterministic_sample

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "k int"
    )
    assert deterministic_sample(df, "k", 1.0).count() == 3  # was 2
    assert deterministic_sample(df, "k", 0.0).count() == 0
    # NULL keys share one deterministic fate (the empty-string hash)
    a = {r.k for r in deterministic_sample(df, "k", 0.5).collect()}
    b = {r.k for r in deterministic_sample(df, "k", 0.5).collect()}
    assert a == b


def test_split_dataset_assigns_null_keys_by_hash(spark):
    from kolang_spark.operators.sampling import split_dataset

    df = spark.createDataFrame([(None,)] * 4 + [(1,)], "k int")
    out = split_dataset(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    splits = {r.split for r in out.where(F.col("k").isNull()).collect()}
    # all NULLs share the ''-hash bucket -> ONE split, chosen by hash
    # (h60('') = 0x... -> train at these fractions), never dumped into
    # the last split by NULL fallthrough
    assert len(splits) == 1
    import hashlib

    h = int(hashlib.md5(b"").hexdigest()[17:32], 16)
    want = (
        "train" if h < int(0.8 * (1 << 60))
        else "val" if h < int((0.8 + 0.1) * (1 << 60))
        else "test"
    )
    assert splits == {want}


def test_with_cumulative_sum_keeps_null_order_and_partition_rows(spark):
    from kolang_spark.operators.scale import with_cumulative_sum

    rows = [(None, 5, "a"), (1, 1, "a"), (2, 2, "a"), (3, 3, None)]
    df = spark.createDataFrame(rows, "o int, v long, p string")
    out = with_cumulative_sum(
        df, "v", "o", bucket=F.col("o"), partition_by="p", out="c"
    )
    got = {(r.p, r.o): r.c for r in out.collect()}
    assert len(got) == 4  # NULL bucket/partition rows survive the join
    # NULLS FIRST: the NULL-order row leads partition 'a'
    assert got[("a", None)] == 5
    assert got[("a", 1)] == 6 and got[("a", 2)] == 8
    assert got[(None, 3)] == 3  # NULL partition is its own series


def test_jalali_pre_epoch_dates_roundtrip(spark):
    """Dates before the 1600-03-20 algorithm epoch: floored modulo
    (pmod) keeps the cycle decomposition correct, and the inverse
    reconstructs the exact Gregorian date."""
    from kolang_spark.functions.jalali import gregorian_date, jalali_parts

    dates = ["1600-02-01", "1599-12-31", "1500-06-15", "1601-01-01",
             "1600-03-19", "1600-03-20"]
    df = spark.createDataFrame([(d,) for d in dates], "s string").select(
        F.to_date("s").alias("d")
    )
    jy, jm, jd = jalali_parts("d")
    out = df.select(
        "d", jy.alias("jy"), jm.alias("jm"), jd.alias("jd")
    ).withColumn("back", gregorian_date("jy", "jm", "jd"))
    rows = {str(r.d): r for r in out.collect()}
    for d in dates:
        assert str(rows[d].back) == d, (d, rows[d])
    # pinned value: 1600-02-01 = Jalali 978-11-12 (Bahman 12)
    r = rows["1600-02-01"]
    assert (r.jy, r.jm, r.jd) == (978, 11, 12)
    # epoch day itself = Farvardin 1, 979
    r = rows["1600-03-20"]
    assert (r.jy, r.jm, r.jd) == (979, 1, 1)


def test_sessionize_and_windows_accept_column_ts_with_watermark(spark):
    """A Column-valued ts + watermark must watermark THAT column (the
    old fallback watermarked a hard-coded 'ts' name). Batch frames
    accept withWatermark as a no-op, so semantics are checkable here."""
    from kolang_spark.streaming.sessions import sessionize
    from kolang_spark.streaming.windows import tumbling

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")],
        "user_id int, event_time string",
    ).select("user_id", F.to_timestamp("event_time").alias("event_time"))
    s = sessionize(
        df, key="user_id", ts=F.col("event_time"), gap="30 minutes",
        watermark="1 hour",
    )
    assert s.count() == 1  # one merged session; no AnalysisException
    t = tumbling(
        df, ts=F.col("event_time"), duration="1 hour",
        keys=["user_id"], watermark="1 hour",
    )
    assert t.count() == 1


def test_interval_join_outer_keeps_right_only_keys(spark):
    from kolang_spark.streaming.joins import interval_join

    L = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "k int, ts string"
    ).select("k", F.to_timestamp("ts").alias("ts"))
    R = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 10), (2, "2024-01-01 00:01:00", 20)],
        "k int, ts string, v int",
    ).select("k", F.to_timestamp("ts").alias("ts"), "v")
    out = interval_join(
        L, R, keys=["k"], lower="0 seconds", upper="5 minutes",
        how="full_outer",
    )
    got = {r.v: r.k for r in out.where(F.col("v").isNotNull()).collect()}
    assert got[10] == 1
    assert got[20] == 2  # right-only row keeps its key (was NULL)
