"""Sessionization: batch golden + determinism + events-table + streaming
mirror (session_window works on batch frames too)."""

import pyspark.sql.functions as F

import kolang_spark as ks
from kolang_spark.sources.io import read_table
from kolang_spark.streaming import sessionize

MIN = 60_000  # ms


def test_session_id_golden(spark):
    rows = [
        ("d1", 0 * MIN),
        ("d1", 10 * MIN),   # same session (10 min gap)
        ("d1", 50 * MIN),   # new session (40 min gap)
        ("d2", 5 * MIN),    # other device → its own session
    ]
    df = spark.createDataFrame(rows, ["device_id", "created_at"])
    out = df.withColumn("sid", ks.session_id()).collect()
    sid = {(r.device_id, r.created_at): r.sid for r in out}
    assert sid[("d1", 0)] == sid[("d1", 10 * MIN)]
    assert sid[("d1", 50 * MIN)] != sid[("d1", 0)]
    assert sid[("d2", 5 * MIN)] not in (sid[("d1", 0)], sid[("d1", 50 * MIN)])


def test_session_id_deterministic_across_repartition(spark):
    rows = [("d%d" % (i % 7), (i * 13 % 200) * MIN) for i in range(200)]
    df = spark.createDataFrame(rows, ["device_id", "created_at"])
    a = {(r.device_id, r.created_at): r.sid
         for r in df.withColumn("sid", ks.session_id()).collect()}
    b = {(r.device_id, r.created_at): r.sid
         for r in df.repartition(13).withColumn("sid", ks.session_id()).collect()}
    assert a == b  # the reference's monotonically_increasing_id variant fails this


def test_session_id_on_events(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = ev.withColumn("sid", ks.session_id("user_id", "ts_ms", 30))
    n_sessions = out.select("sid").distinct().count()
    n_users = ev.select("user_id").distinct().count()
    assert n_sessions >= n_users > 0


def test_sessionize_batch_matches_session_id_counts(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    batch_ids = ev.withColumn("sid", ks.session_id("user_id", "ts_ms", 30))
    n_batch = batch_ids.select("sid").distinct().count()
    streamed = sessionize(ev, key="user_id", ts="ts", gap="30 minutes")
    # same inactivity-gap semantics → same number of sessions
    assert streamed.count() == n_batch


def test_sessionize_has_bounds_and_counts(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(minutes=10)),
        (1, t0 + datetime.timedelta(minutes=70)),
        (2, t0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, key="user_id", ts="ts", gap="30 minutes").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert len(by_key[1]) == 2
    assert len(by_key[2]) == 1
    first = min(by_key[1], key=lambda r: r.session_start)
    assert first.n_events == 2


def test_sessionize_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Drive sessionize through Structured Streaming (file source →
    stateful session-window agg → memory sink): results must equal the
    batch run of the same operator."""
    import uuid

    from kolang_spark.sources.io import read_table
    from kolang_spark.streaming import sessionize

    ev = read_table(spark, sf_dir, "events").select("ts", "user_id")
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = sessionize(stream, key="user_id", ts="ts", gap="30 minutes",
                     watermark="2 hours")
    sink = f"sess_{uuid.uuid4().hex[:8]}"
    q = (agg.writeStream.format("memory").queryName(sink)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    batch = sorted(
        tuple(r) for r in
        sessionize(ev, key="user_id", ts="ts", gap="30 minutes").collect()
    )
    streamed = sorted(tuple(r) for r in spark.table(sink).collect())
    assert streamed == batch
