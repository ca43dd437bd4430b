"""Tumbling/sliding event-time windows — batch semantics plus a real
Structured Streaming run (file source → stateful windowed agg → memory
sink) proving the same operator works as a stream."""

import datetime as dt
import uuid

import pyspark.sql.functions as F

from kolang_spark.sources.io import read_table
from kolang_spark.streaming import sliding, tumbling


def _mk_events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", base + dt.timedelta(minutes=m), 1.0)
        for m in (0, 10, 50, 70, 125)
    ] + [("b", base + dt.timedelta(minutes=65), 2.0)]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_tumbling_batch_golden(spark):
    out = tumbling(
        _mk_events(spark),
        ts="ts",
        duration="1 hour",
        keys=["k"],
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
    )
    got = {
        (r["k"], r["window_start"].minute + 60 * r["window_start"].hour): (
            r["n"],
            r["s"],
        )
        for r in out.collect()
    }
    # hour 0: a has 3 events; hour 1: a has 1, b has 1; hour 2: a has 1
    assert got == {
        ("a", 0): (3, 3.0),
        ("a", 60): (1, 1.0),
        ("b", 60): (1, 2.0),
        ("a", 120): (1, 1.0),
    }
    # window_end − window_start = duration
    r0 = out.collect()[0]
    assert (r0["window_end"] - r0["window_start"]) == dt.timedelta(hours=1)


def test_sliding_each_event_in_duration_over_slide_windows(spark):
    ev = _mk_events(spark)
    out = sliding(ev, ts="ts", duration="1 hour", slide="30 minutes", keys=["k"])
    # every event lands in exactly 2 windows → total count doubles
    assert out.agg(F.sum("n_events")).first()[0] == 2 * ev.count()


def test_tumbling_matches_oracle_shape_on_events(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    out = tumbling(ev, ts="ts", duration="1 hour", keys=["event_type"])
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()


def test_tumbling_streaming_matches_batch(spark, sf_dir, tmp_path):
    """Drive the SAME operator through Structured Streaming: file source,
    stateful window aggregation, availableNow trigger, memory sink —
    results must equal the batch run."""
    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "stream_src")
    ev.write.parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = tumbling(
        stream,
        ts="ts",
        duration="1 hour",
        keys=["event_type"],
        aggs={"n_events": F.count(F.lit(1))},
        watermark="2 hours",
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in tumbling(
            ev, ts="ts", duration="1 hour", keys=["event_type"]
        ).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table(sink).collect()
    }
    assert streamed == batch


def test_interval_join_stream_stream_matches_batch(spark, sf_dir, tmp_path):
    """TRUE stream-stream join: both sides are file streams with
    watermarks; the event-time bound lets Spark run it. Inner results
    must equal the batch run of the same call."""
    from kolang_spark.streaming import interval_join

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    vsrc, psrc = str(tmp_path / "views"), str(tmp_path / "purchases")
    views.write.parquet(vsrc)
    purchases.write.parquet(psrc)

    batch = {
        (r.view_id, r.r_pts)
        for r in interval_join(
            views, purchases, keys=["user_id"], left_ts="ts",
            right_ts="pts", upper="30 minutes",
        ).collect()
    }
    assert batch, "fixture should produce view→purchase matches"

    vs = spark.readStream.schema(views.schema).parquet(vsrc)
    ps = spark.readStream.schema(purchases.schema).parquet(psrc)
    joined = interval_join(
        vs, ps, keys=["user_id"], left_ts="ts", right_ts="pts",
        upper="30 minutes", watermark="2 hours",
    )
    sink = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.view_id, r.r_pts) for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    assert streamed == batch


def test_upsert_sink_streaming_merge(spark, tmp_path):
    """CDC-shaped stream into a hive-partitioned parquet table: the
    first batch creates the table, later files upsert through the
    partition-pruned merge; the final table equals applying the update
    log in order."""
    from kolang_spark.streaming import upsert_sink

    src = tmp_path / "cdc"
    src.mkdir()
    tbl = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, p string, v long, seq long"

    # stage 1: initial rows
    spark.createDataFrame(
        [(1, "a", 10, 1), (2, "a", 20, 1), (3, "b", 30, 1)], schema
    ).coalesce(1).write.parquet(str(src / "f1"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = upsert_sink(
        stream, tbl, keys=["id"], partition_by=["p"],
        order_col="seq", checkpoint=ckpt,
    )
    q.awaitTermination(120)
    got1 = {r.id: r.v for r in spark.read.parquet(tbl).collect()}
    assert got1 == {1: 10, 2: 20, 3: 30}

    # stage 2: an update (id=1, two versions — last wins) and an insert
    spark.createDataFrame(
        [(1, "a", 11, 2), (1, "a", 12, 3), (4, "b", 40, 2)], schema
    ).coalesce(1).write.parquet(str(src / "f2"))
    q2 = upsert_sink(
        stream, tbl, keys=["id"], partition_by=["p"],
        order_col="seq", checkpoint=ckpt,
    )
    q2.awaitTermination(120)
    got2 = {r.id: r.v for r in spark.read.parquet(tbl).collect()}
    assert got2 == {1: 12, 2: 20, 3: 30, 4: 40}


def _pin_mtimes(*dirs):
    """FileStreamSource orders files by modification time; parquet
    writes landing in the same mtime tick could flip the micro-batch
    order. Pin strictly increasing mtimes so batch order is the write
    order, deterministically."""
    import os

    base = 1_700_000_000
    for i, d in enumerate(dirs):
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (base + i, base + i))
        os.utime(d, (base + i, base + i))


def test_minhash_dedup_sink_stream_equals_batch(spark, tmp_path):
    """Streaming near-dup ingest over two micro-batches == running the
    batch operator twice on the same batches: same accepted set, same
    persisted band-key state."""
    from kolang_spark.llm.dedup import incremental_minhash_dedup
    from kolang_spark.streaming import minhash_dedup_sink

    t_a = "the quick brown fox jumps over the lazy dog today"
    t_b = "completely different content with many unique words inside"
    t_c = "a third document that shares nothing with the others at all"
    b1 = [(1, t_a), (2, t_b), (3, t_a)]          # 3 near-dups 1 in-batch
    b2 = [(4, t_a), (5, t_c)]                    # 4 near-dups state; 5 novel
    schema = "doc_id long, text string"

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    _pin_mtimes(src / "f1", src / "f2")

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = minhash_dedup_sink(
        stream, state, out, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    accepted = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert accepted == [1, 2, 5]
    # duplicates never enter the output and the flag column is dropped
    assert "is_near_duplicate" not in spark.read.parquet(out).columns

    # batch replay of the same two batches against a fresh state
    state2 = str(tmp_path / "state2")
    m1 = incremental_minhash_dedup(
        spark, spark.createDataFrame(b1, schema), state2
    )
    batch_acc = [r.doc_id for r in m1.where("NOT is_near_duplicate").collect()]
    m2 = incremental_minhash_dedup(
        spark, spark.createDataFrame(b2, schema), state2
    )
    batch_acc += [r.doc_id for r in m2.where("NOT is_near_duplicate").collect()]
    assert sorted(batch_acc) == accepted

    # identical persisted state (band-key multisets)
    s_stream = sorted(
        (r.band_id, r.band_key) for r in spark.read.parquet(state).collect()
    )
    s_batch = sorted(
        (r.band_id, r.band_key) for r in spark.read.parquet(state2).collect()
    )
    assert s_stream == s_batch


def test_minhash_dedup_sink_keep_duplicates_flags(spark, tmp_path):
    from kolang_spark.streaming import minhash_dedup_sink

    t = "one single piece of text repeated across both documents here"
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, t), (2, t)], schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = minhash_dedup_sink(
        stream,
        str(tmp_path / "state"),
        str(tmp_path / "out"),
        keep_duplicates=True,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: r.is_near_duplicate
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {1: False, 2: True}


def test_line_dedup_sink_stream_equals_batch(spark, tmp_path):
    """Streaming line-dedup ingest over two micro-batches == running
    the batch operator twice on the same batches: same rebuilt texts,
    same persisted line-hash state."""
    from kolang_spark.llm.dedup import incremental_line_dedup
    from kolang_spark.streaming import line_dedup_sink

    b1 = [(1, "alpha one\nshared line\nbeta two"),
          (2, "shared line\ngamma three")]        # batch-internal dup
    b2 = [(3, "shared line\ndelta four"),         # state hit
          (4, "epsilon five\n\nzeta six")]        # ws line survives
    schema = "doc_id long, text string"

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    _pin_mtimes(src / "f1", src / "f2")

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = line_dedup_sink(stream, state, out, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {
        r.doc_id: (r.text_deduped, r.n_kept, r.n_removed)
        for r in spark.read.parquet(out).collect()
    }
    assert got[1] == ("alpha one\nshared line\nbeta two", 3, 0)
    assert got[2] == ("gamma three", 1, 1)          # in-batch keep-first
    assert got[3] == ("delta four", 1, 1)           # state hit removed
    assert got[4] == ("epsilon five\n\nzeta six", 3, 0)  # ws structural

    # batch replay of the same two batches against a fresh state
    state2 = str(tmp_path / "state2")
    rows = incremental_line_dedup(
        spark, spark.createDataFrame(b1, schema), state2
    ).collect()
    rows += incremental_line_dedup(
        spark, spark.createDataFrame(b2, schema), state2
    ).collect()
    batch_got = {r.doc_id: (r.text_deduped, r.n_kept, r.n_removed) for r in rows}
    assert batch_got == got

    # identical persisted state (kept-line-hash multisets)
    s_stream = sorted(r.line_key for r in spark.read.parquet(state).collect())
    s_batch = sorted(r.line_key for r in spark.read.parquet(state2).collect())
    assert s_stream == s_batch


def test_line_dedup_crash_before_state_append_never_loses(spark, tmp_path):
    """The sinks' documented crash contract, pinned mechanically: a
    batch that crashes AFTER its output append but BEFORE its state
    append recomputes the IDENTICAL keep flags on replay (duplicate
    output rows at worst, zero loss). The negative control shows the
    inverse order would lose data: once the state append lands, a
    re-run of the same batch strips every line it had just recorded."""
    from kolang_spark.llm.dedup import (
        _incremental_lines_flagged,
        incremental_line_dedup,
    )

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, "alpha one\nshared line")], schema)
    incremental_line_dedup(spark, b1, state).collect()  # state = batch 1

    b2 = spark.createDataFrame(
        [(2, "shared line\nbeta two"), (3, "beta two\ngamma three")], schema
    )
    # crashed attempt: flags computed (and output written, conceptually)
    # but the state append never happens
    marked_crash, _novel = _incremental_lines_flagged(
        spark, b2, state, "doc_id", "text", "\n"
    )
    crash_keeps = sorted(
        (r["_id"], r["_pos"])
        for r in marked_crash.where("_keep").collect()
    )
    # replay after the crash: the full operator (which DOES append
    # state) must compute the same keep set — nothing lost
    replay = incremental_line_dedup(spark, b2, state)
    got = {r.doc_id: (r.text_deduped, r.n_kept) for r in replay.collect()}
    assert got[2] == ("beta two", 1)        # 'shared line' was state-hit
    assert got[3] == ("gamma three", 1)     # 'beta two' in-batch first won
    assert len(crash_keeps) == sum(k for _t, k in got.values())

    # negative control — state-first ordering WOULD lose everything:
    # now that the replay appended state, a third run of the same batch
    # finds all its own lines in state and strips them
    third = incremental_line_dedup(spark, b2, state)
    assert {r.n_kept for r in third.collect()} == {0}


def test_minhash_crash_before_state_append_never_loses(spark, tmp_path):
    """Same contract for the MinHash sink core: flags recomputed after
    a crash-before-state-append match the crashed attempt's accept
    set; after state lands, a re-run flags everything near-duplicate."""
    from kolang_spark.llm.dedup import (
        _incremental_minhash_flagged,
        incremental_minhash_dedup,
    )

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    t_a = "the quick brown fox jumps over the lazy dog today"
    t_b = "completely different content with many unique words inside"
    incremental_minhash_dedup(
        spark, spark.createDataFrame([(1, t_a)], schema), state
    ).collect()

    b2 = spark.createDataFrame([(2, t_a), (3, t_b)], schema)
    marked_crash, _novel = _incremental_minhash_flagged(spark, b2, state)
    crash_accepts = sorted(
        r.doc_id for r in marked_crash.where("NOT is_near_duplicate").collect()
    )
    assert crash_accepts == [3]  # 2 is a state near-dup of 1
    replay = incremental_minhash_dedup(spark, b2, state)
    replay_accepts = sorted(
        r.doc_id for r in replay.where("NOT is_near_duplicate").collect()
    )
    assert replay_accepts == crash_accepts  # identical flags — no loss

    # negative control: state now contains doc 3's bands, so a re-run
    # of the same batch flags 3 as its own duplicate — the loss mode
    # the output-before-state ordering exists to prevent
    third = incremental_minhash_dedup(spark, b2, state)
    assert sorted(
        r.doc_id for r in third.where("NOT is_near_duplicate").collect()
    ) == []


def test_embedding_dedup_sink_stream_equals_batch(spark, tmp_path):
    """Streaming sign-LSH embedding ingest over two micro-batches ==
    the batch operator twice on the same batches: same flags, same
    persisted band-key state."""
    from kolang_spark.llm.dedup import incremental_embedding_dedup
    from kolang_spark.streaming import embedding_dedup_sink

    def vec(seed, flip=0.0):
        return [float(((seed * 31 + k * 17) % 19) - 9) + flip for k in range(64)]

    b1 = [(1, vec(1)), (2, vec(2))]
    b2 = [(3, vec(1)), (4, vec(7))]        # 3 collides with state (≡ vec 1)
    schema = "vec_id long, embedding array<double>"

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    _pin_mtimes(src / "f1", src / "f2")

    out = str(tmp_path / "out")
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = embedding_dedup_sink(
        stream, state, out, keep_duplicates=True,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    got = {
        r.vec_id: r.is_near_duplicate
        for r in spark.read.parquet(out).collect()
    }
    assert got[1] is False and got[2] is False
    assert got[3] is True            # identical vector -> state band hit
    assert got[4] is False

    # batch replay against a fresh state: identical flags and state
    state2 = str(tmp_path / "state2")
    m1 = incremental_embedding_dedup(
        spark, spark.createDataFrame(b1, schema), state2
    )
    batch_got = {r.vec_id: r.is_near_duplicate for r in m1.collect()}
    m2 = incremental_embedding_dedup(
        spark, spark.createDataFrame(b2, schema), state2
    )
    batch_got.update({r.vec_id: r.is_near_duplicate for r in m2.collect()})
    assert batch_got == got
    s_stream = sorted(
        (r.band_id, r.band_key) for r in spark.read.parquet(state).collect()
    )
    s_batch = sorted(
        (r.band_id, r.band_key) for r in spark.read.parquet(state2).collect()
    )
    assert s_stream == s_batch


def test_sink_replay_after_state_append_is_flag_idempotent(spark, tmp_path):
    """The OTHER crash window — after the state append but before the
    streaming checkpoint commit: because sink state rows carry the
    (replay-stable) foreachBatch batch_id and the flag computation
    excludes the replaying batch's own rows, the replay recomputes
    identical flags instead of gutting its own documents. The negative
    control (no exclusion) shows exactly the gutting this prevents."""
    from pyspark.sql import functions as F

    from kolang_spark.llm.dedup import _incremental_lines_flagged

    schema = "doc_id long, text string"
    state = str(tmp_path / "state")
    b = spark.createDataFrame(
        [(1, "alpha one\nbeta two"), (2, "beta two\ngamma three")], schema
    )
    # batch 7's first attempt: flags computed, OUTPUT written
    # (conceptually), state appended WITH the batch stamp — then crash
    marked1, novel1 = _incremental_lines_flagged(
        spark, b, state, "doc_id", "text", "\n", exclude_batch=7
    )
    keeps1 = sorted(
        (r["_id"], r["_pos"]) for r in marked1.where("_keep").collect()
    )
    novel1.withColumn("batch_id", F.lit(7)).write.mode("append").parquet(state)

    # replay of batch 7: own state rows excluded -> identical flags
    marked2, novel2 = _incremental_lines_flagged(
        spark, b, state, "doc_id", "text", "\n", exclude_batch=7
    )
    keeps2 = sorted(
        (r["_id"], r["_pos"]) for r in marked2.where("_keep").collect()
    )
    assert keeps2 == keeps1
    # and the re-appended novel keys are the same set (state gains
    # duplicates, which the de-duplicated state read tolerates)
    assert sorted(r.line_key for r in novel2.collect()) == sorted(
        r.line_key for r in novel1.collect()
    )

    # negative control: a DIFFERENT batch (or an unstamped replay)
    # sees batch 7's keys and strips every non-whitespace line
    marked3, _ = _incremental_lines_flagged(
        spark, b, state, "doc_id", "text", "\n", exclude_batch=8
    )
    assert marked3.where("_keep AND NOT _ws").count() == 0


def test_cms_sink_stream_equals_batch(spark, tmp_path):
    """Streaming CMS ingest over two micro-batches == one batch sketch
    of the concatenated data: counter-for-counter identical state, and
    estimates from the merged state dominate the exact counts."""
    from kolang_spark.operators.sketches import cms_estimate, cms_table
    from kolang_spark.streaming import cms_sink, cms_state

    b1 = [(i, f"u{i % 3}") for i in range(30)]
    b2 = [(i, f"u{i % 5}") for i in range(40)]
    schema = "id long, user string"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "f2"))
    _pin_mtimes(src / "f1", src / "f2")

    state = str(tmp_path / "state")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = cms_sink(
        stream, state, "user", depth=3, width=64,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    merged = cms_state(spark, state)
    both = spark.createDataFrame(b1 + b2, schema)
    direct = cms_table(both, "user", depth=3, width=64)
    got = sorted((r.row, r.bucket, r.cnt) for r in merged.collect())
    want = sorted((r.row, r.bucket, r.cnt) for r in direct.collect())
    assert got == want

    exact = {r.user: r.c for r in both.groupBy("user").agg(
        F.count(F.lit(1)).alias("c")).collect()}
    est = {
        r.item: r.est_count
        for r in cms_estimate(
            merged, both.select("user"), "user", depth=3, width=64
        ).collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]  # CMS overestimates only


def test_cms_sink_replay_is_idempotent(spark, tmp_path):
    """A crash-replayed batch must REPLACE its own state partition, not
    append a second copy — exercise the sink's write primitive twice
    with the same batch_id and prove the merged counters are unchanged."""
    from kolang_spark.operators.sketches import cms_table
    from kolang_spark.sources.io import overwrite_partitions
    from kolang_spark.streaming import cms_state

    df = spark.createDataFrame([(i, f"u{i % 4}") for i in range(20)],
                               "id long, user string")
    state = str(tmp_path / "state")
    sk = cms_table(df, "user", depth=3, width=32).withColumn(
        "batch_id", F.lit(7)
    )
    overwrite_partitions(sk, state, partition_by=["batch_id"])
    once = sorted((r.row, r.bucket, r.cnt)
                  for r in cms_state(spark, state).collect())
    overwrite_partitions(sk, state, partition_by=["batch_id"])  # the replay
    twice = sorted((r.row, r.bucket, r.cnt)
                   for r in cms_state(spark, state).collect())
    assert once == twice


def test_sink_state_batch_id_is_parquet_int64(spark, tmp_path):
    """Advisor r13: the sinks stamp batch_id with F.lit(int), which
    py4j materializes as IntegerType — without an explicit cast the
    state files hold Parquet INT32 while the explicit read schema says
    bigint, a silent Spark-4-only widening dependency (Spark 3.x
    throws SchemaColumnConvertNotSupportedException). Assert the
    physical type written by the minhash sink is INT64."""
    import os

    import pyarrow.parquet as pq
    from kolang_spark.streaming import minhash_dedup_sink

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "some unique text for the int64 stamp test")], schema
    ).coalesce(1).write.parquet(str(src / "f1"))
    state = str(tmp_path / "state")
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    q = minhash_dedup_sink(
        stream, state, str(tmp_path / "out"), checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(state)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert files, "sink wrote no state files"
    for f in files:
        field = pq.read_schema(f).field("batch_id")
        assert str(field.type) == "int64", (f, field.type)


def _delete_last_commit(ckpt: str) -> int:
    """Simulate a crash AFTER batch N's writes but BEFORE its streaming
    checkpoint commit: delete the newest <ckpt>/commits/N marker. On
    restart the engine sees offsets/N without commits/N and REPLAYS
    batch N with the same batch_id over the same input slice — the
    exact window the sinks' replay contract covers. Returns N."""
    import os

    commits = os.path.join(ckpt, "commits")
    ids = sorted(int(f) for f in os.listdir(commits) if f.isdigit())
    os.remove(os.path.join(commits, str(ids[-1])))
    # the Hadoop local FS keeps a checksum sibling; leaving it behind
    # makes the replay's commit rename fail and Spark misreport it as
    # 'multiple streaming queries are concurrently using' the dir
    crc = os.path.join(commits, f".{ids[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    return ids[-1]


def _two_batch_source(spark, tmp_path, rows1, rows2, schema):
    src = tmp_path / "src"
    src.mkdir(parents=True)
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    _pin_mtimes(src / "f1", src / "f2")
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )


def test_minhash_sink_idempotent_output_replay_exact_rows(spark, tmp_path):
    """r12 verdict item 4: with idempotent_output=True a crash-replayed
    batch REPLACES its own _batch_id output partition, so the final
    output is EXACTLY the same rows — not merely no-lost-rows. The
    negative control shows default append-mode replay duplicating the
    replayed batch's rows (the documented at-least-once artifact)."""
    from kolang_spark.streaming import minhash_dedup_sink

    t_a = "the quick brown fox jumps over the lazy dog today"
    t_c = "a third document that shares nothing with the others at all"
    schema = "doc_id long, text string"
    b1 = [(1, t_a), (2, "completely different content many unique words"), (3, t_a)]
    b2 = [(4, t_a), (5, t_c)]

    stream = _two_batch_source(spark, tmp_path, b1, b2, schema)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = minhash_dedup_sink(
        stream, str(tmp_path / "state"), out, checkpoint=ckpt,
        idempotent_output=True,
    )
    q.awaitTermination(120)
    first = sorted(
        (r.doc_id, r["_batch_id"]) for r in spark.read.parquet(out).collect()
    )
    assert [d for d, _ in first] == [1, 2, 5]
    assert {b for _, b in first} == {0, 1}  # one hive partition per batch

    replayed = _delete_last_commit(ckpt)
    assert replayed == 1
    q2 = minhash_dedup_sink(
        stream, str(tmp_path / "state"), out, checkpoint=ckpt,
        idempotent_output=True,
    )
    q2.awaitTermination(120)
    second = sorted(
        (r.doc_id, r["_batch_id"]) for r in spark.read.parquet(out).collect()
    )
    assert second == first  # exactly the same rows — not just no loss

    # negative control: default append mode duplicates the replayed
    # batch's output rows (at-least-once, removable by doc_id)
    stream_c = _two_batch_source(
        spark, tmp_path / "ctl", b1, b2, schema
    )
    out_c, ckpt_c = str(tmp_path / "out_c"), str(tmp_path / "ckpt_c")
    qc = minhash_dedup_sink(
        stream_c, str(tmp_path / "state_c"), out_c, checkpoint=ckpt_c
    )
    qc.awaitTermination(120)
    _delete_last_commit(ckpt_c)
    qc2 = minhash_dedup_sink(
        stream_c, str(tmp_path / "state_c"), out_c, checkpoint=ckpt_c
    )
    qc2.awaitTermination(120)
    dup = sorted(r.doc_id for r in spark.read.parquet(out_c).collect())
    assert dup == [1, 2, 5, 5]  # batch 1's accepted row appended twice


def test_line_sink_idempotent_output_replay_exact_rows(spark, tmp_path):
    """Same exactly-once upgrade for the line-dedup sink family."""
    from kolang_spark.streaming import line_dedup_sink

    schema = "doc_id long, text string"
    b1 = [(1, "alpha one\nshared line")]
    b2 = [(2, "shared line\nbeta two"), (3, "beta two\ngamma three")]
    stream = _two_batch_source(spark, tmp_path, b1, b2, schema)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = line_dedup_sink(
        stream, str(tmp_path / "state"), out, checkpoint=ckpt,
        idempotent_output=True,
    )
    q.awaitTermination(120)
    first = sorted(
        (r.doc_id, r.text_deduped, r["_batch_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert _delete_last_commit(ckpt) == 1
    q2 = line_dedup_sink(
        stream, str(tmp_path / "state"), out, checkpoint=ckpt,
        idempotent_output=True,
    )
    q2.awaitTermination(120)
    second = sorted(
        (r.doc_id, r.text_deduped, r["_batch_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert second == first


def test_embedding_sink_idempotent_output_replay_exact_rows(
    spark, tmp_path
):
    """Same exactly-once upgrade for the embedding-dedup sink family."""
    from kolang_spark.streaming import embedding_dedup_sink

    dims = 8
    va = [float(i) for i in range(dims)]
    vb = [float(dims - i) for i in range(dims)]
    vc = [1.0, -1.0] * (dims // 2)
    schema = "vec_id long, embedding array<double>"
    b1 = [(1, va), (2, vb)]
    b2 = [(3, va), (4, vc)]
    stream = _two_batch_source(spark, tmp_path, b1, b2, schema)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = embedding_dedup_sink(
        stream, str(tmp_path / "state"), out, dims=dims,
        checkpoint=ckpt, idempotent_output=True,
    )
    q.awaitTermination(120)
    first = sorted(
        (r.vec_id, r["_batch_id"]) for r in spark.read.parquet(out).collect()
    )
    assert _delete_last_commit(ckpt) == 1
    q2 = embedding_dedup_sink(
        stream, str(tmp_path / "state"), out, dims=dims,
        checkpoint=ckpt, idempotent_output=True,
    )
    q2.awaitTermination(120)
    second = sorted(
        (r.vec_id, r["_batch_id"]) for r in spark.read.parquet(out).collect()
    )
    assert second == first
