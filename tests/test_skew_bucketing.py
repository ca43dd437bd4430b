"""Skew mitigation (salted join, skew-safe distinct) and bucketed
co-located joins — scale-path operators, value-checked against the
naive formulations."""

import uuid

import pyspark.sql.functions as F
import pytest

from kolang_spark.operators.skew import salted_join, skew_safe_distinct_count
from kolang_spark.sources.bucketing import assert_no_shuffle_join, write_bucketed
from kolang_spark.sources.io import read_table


def _sorted_rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    od = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(od, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, od, on=["o_orderkey"], salt=8)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _sorted_rows(plain, "o_orderpriority", "n") == _sorted_rows(
        salted, "o_orderpriority", "n"
    )


def test_salted_join_left_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, x string")
    small = spark.createDataFrame([(1, "v1"), (2, "v2")], "k int, v string")
    out = salted_join(big, small, on=["k"], how="left", salt=4)
    assert out.count() == 3
    assert out.where(F.col("k") == 99).first()["v"] is None


def test_salted_join_deterministic_salt_by(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"
    )
    od = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    out = salted_join(li, od, on=["o_orderkey"], salt=8, salt_by=F.col("l_linenumber"))
    assert out.count() == li.join(od, "o_orderkey").count()


def test_salted_join_balances_hot_key_and_keeps_salt_in_shuffle(spark, sf_dir):
    """The measured local proxy for the 100 TB skew claim (round-6
    verdict item 8), asserted structurally rather than by wall clock
    (this host's timing drift would make a latency assertion flaky;
    the measured A/B — plain 2.98 s / AQE-skewJoin 2.61 s / salted
    2.31 s on a 4.8M-row 90%-hot-key join — is recorded in
    BASELINE.md). Two deterministic facts prove the mechanism:

    1. partition balance: hashing the synthetic 90%-hot key alone
       lands ~90% of rows in ONE shuffle partition; hashing
       (key, salt) caps the max partition share near uniform.
    2. plan shape: the salted join's Exchange hash-partitions on
       __ks_salt__ (the hot key's rows really do spread), and the
       un-dropped salt never leaks into the output schema.
    """
    li = read_table(spark, sf_dir, "lineitem")
    big = li.select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    n = big.count()

    def max_share(df, *cols):
        dist = (
            df.repartition(32, *[F.col(c) for c in cols])
            .select(F.spark_partition_id().alias("p"))
            .groupBy("p")
            .count()
        )
        return max(r["count"] for r in dist.collect()) / n

    assert max_share(big, "k") > 0.85  # the hot key funnels one reducer
    salted = big.withColumn(
        "__ks_salt__", F.floor(F.rand(seed=0) * 16).cast("int")
    )
    assert max_share(salted, "k", "__ks_salt__") < 0.2

    dim = big.select("k").distinct().select("k", (F.col("k") % 97).alias("w"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(big, dim, on=["k"], salt=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__ks_salt__" in plan  # salt participates in the exchange
        assert "__ks_salt__" not in out.columns  # and never leaks out
        got = out.groupBy().agg(
            F.sum(F.col("l_quantity") * F.col("w")).alias("s")
        ).first()["s"]
        want = big.join(dim, "k").groupBy().agg(
            F.sum(F.col("l_quantity") * F.col("w")).alias("s")
        ).first()["s"]
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skew_safe_distinct_count_matches_count_distinct(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    naive = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_distinct")
    )
    safe = skew_safe_distinct_count(ev, ["event_type"], "user_id")
    assert _sorted_rows(naive, "event_type", "n_distinct") == _sorted_rows(
        safe, "event_type", "n_distinct"
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Write orders + a lineitem aggregate bucketed by orderkey, join
    them, and assert the physical plan contains no Exchange."""
    od = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    t1, t2 = f"b1_{uuid.uuid4().hex[:8]}", f"b2_{uuid.uuid4().hex[:8]}"
    write_bucketed(od, t1, ["o_orderkey"], num_buckets=4, path=str(tmp_path / t1))
    write_bucketed(li, t2, ["o_orderkey"], num_buckets=4, path=str(tmp_path / t2))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "o_orderkey")
        assert_no_shuffle_join(joined)
        # and it computes the right thing
        n = joined.count()
        assert n == od.join(li, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_top_k_per_group_plan_uses_window_group_limit(spark, sf_dir):
    from kolang_spark.operators.sampling import top_k_per_group
    from kolang_spark.plans.audit import explain_str

    od = read_table(spark, sf_dir, "orders")
    out = top_k_per_group(od, "o_orderpriority", ["o_totalprice", "o_orderkey"], 3)
    # per-group sizes and global shape
    counts = [r["n"] for r in out.groupBy("o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert all(c == 3 for c in counts)
    # Spark >= 3.5 prunes each partition to its local top-k pre-shuffle
    assert "WindowGroupLimit" in explain_str(out, mode="simple")


def test_deterministic_sample_stable_and_composable(spark, sf_dir):
    from kolang_spark.operators.sampling import deterministic_sample

    od = read_table(spark, sf_dir, "orders")
    a = {r["o_orderkey"] for r in
         deterministic_sample(od, "o_orderkey", 0.1).select("o_orderkey").collect()}
    b = {r["o_orderkey"] for r in
         deterministic_sample(od.repartition(7), "o_orderkey", 0.1)
         .select("o_orderkey").collect()}
    assert a == b                      # partitioning-independent
    assert 0.05 < len(a) / od.count() < 0.15
    # independent draw under a different salt
    c = {r["o_orderkey"] for r in
         deterministic_sample(od, "o_orderkey", 0.1, salt="x")
         .select("o_orderkey").collect()}
    assert c != a


def test_stratified_sample_per_stratum_fractions(spark, sf_dir):
    """Per-stratum hash gating: full stratum kept at 1.0, empty at 0.0,
    unlisted strata follow default_fraction; same key set under any
    partitioning; per-stratum subsets are nested consistently with the
    flat deterministic_sample at the same fraction."""
    from kolang_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )
    from kolang_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_none = langs[0], langs[1]
    out = stratified_sample(
        docs, "lang", {keep_all: 1.0, keep_none: 0.0}, "doc_id",
        default_fraction=0.3,
    )
    got = {r.doc_id: r.lang for r in out.select("doc_id", "lang").collect()}
    n_all = docs.where(F.col("lang") == keep_all).count()
    assert sum(1 for v in got.values() if v == keep_all) == n_all
    assert not any(v == keep_none for v in got.values())
    # default-fraction strata must equal the flat sample restricted to them
    flat = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.3)
        .select("doc_id").collect()
    }
    others = {k for k, v in got.items() if v not in (keep_all, keep_none)}
    expect = {
        r.doc_id
        for r in docs.where(~F.col("lang").isin(keep_all, keep_none))
        .select("doc_id").collect()
    } & flat
    assert others == expect
    # partition-independence
    out2 = stratified_sample(
        docs.repartition(7), "lang", {keep_all: 1.0, keep_none: 0.0}, "doc_id",
        default_fraction=0.3,
    )
    assert {r.doc_id for r in out2.select("doc_id").collect()} == set(got)
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", {keep_all: 1.2}, "doc_id")


def test_skew_report_identifies_hot_keys(spark):
    """skew_report: hot key surfaces first with the right factor; NULL
    keys are real groups; output is deterministic under count ties."""
    from kolang_spark.operators import skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 20 + [(None,)] * 20 + [
        (f"cold{i}",) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, ["k"], top_k=3).collect()
    assert [r.k for r in out] == ["hot", None, "warm"] or [r.k for r in out] == ["hot", "warm", None]
    top = out[0]
    # 120 rows over 23 distinct keys -> uniform share ~5.2; hot=60
    assert top.k == "hot" and top.n_rows == 60
    assert top.share_pct == pytest.approx(50.0)
    assert top.skew_factor == pytest.approx(60 / (120 / 23))
    # count tie between NULL and warm (20 each): deterministic order
    # by key value with NULL sorting per Spark/DuckDB agreement is not
    # asserted beyond membership; factors must match
    assert {r.n_rows for r in out[1:]} == {20}
    import pytest as _pt
    with _pt.raises(ValueError):
        skew_report(df, ["k"], top_k=0)


def test_split_dataset_assigns_stably_and_locally(spark, sf_dir):
    """Every row gets exactly one split, proportions track the
    fractions, assignment is identical across calls and across tables
    sharing the key, and growing a later split never reassigns rows
    between earlier ones (the hash-range layout contract)."""
    from kolang_spark.operators.sampling import split_dataset

    dc = read_table(spark, sf_dir, "documents").select("doc_id")
    out = split_dataset(dc, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.doc_id: r.split for r in out.collect()}
    n = len(rows)
    assert n == dc.count()  # no NULLs, no lost rows
    from collections import Counter

    c = Counter(rows.values())
    assert abs(c["train"] / n - 0.8) < 0.08
    assert set(c) == {"train", "val", "test"}
    again = {r.doc_id: r.split for r in
             split_dataset(dc, "doc_id",
                           {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == rows
    # growing val (0.1 -> 0.15) at test's expense: train unchanged,
    # moves flow only test -> val
    grown = {r.doc_id: r.split for r in
             split_dataset(dc, "doc_id",
                           {"train": 0.8, "val": 0.15, "test": 0.05}).collect()}
    for k, s in rows.items():
        if s == "train":
            assert grown[k] == "train"
        elif s == "val":
            assert grown[k] == "val"
        else:
            assert grown[k] in ("val", "test")

    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_dataset(dc, "doc_id", {"train": 1.0})
    with _pytest.raises(ValueError):
        split_dataset(dc, "doc_id", {"a": 0.5, "b": 0.4})


def test_mix_datasets_hits_target_proportions(spark, sf_dir):
    """The mixture matches the target proportions at max volume: the
    limiting domain is kept whole, every other domain downsampled to
    the exact computed fraction, unlisted domains dropped, and the
    selection is deterministic."""
    from collections import Counter

    from kolang_spark.operators.sampling import mix_datasets

    dc = read_table(spark, sf_dir, "documents").select("doc_id", "lang")
    weights = {"en": 0.4, "zh": 0.2, "es": 0.2, "de": 0.1, "fr": 0.1}
    out = mix_datasets(dc, "lang", weights, "doc_id")
    got = [(r.doc_id, r.lang) for r in out.collect()]
    langs = Counter(l for _, l in got)
    assert set(langs) <= set(weights)
    src = Counter(r.lang for r in dc.collect())
    t = min(src[l] / p for l, p in weights.items())
    # the limiting domain survives whole
    limiting = min(weights, key=lambda l: src[l] / weights[l])
    assert langs[limiting] == src[limiting]
    # achieved proportions track the target (hash sampling is
    # binomial around the exact fraction)
    total = sum(langs.values())
    for l, p in weights.items():
        assert abs(langs[l] / total - p) < 0.07, (l, langs[l] / total, p)
    # deterministic
    again = [(r.doc_id, r.lang) for r in
             mix_datasets(dc, "lang", weights, "doc_id").collect()]
    assert sorted(again) == sorted(got)
    # unlisted domain dropped entirely
    sub = mix_datasets(dc, "lang", {"en": 0.7, "zh": 0.3}, "doc_id")
    assert set(r.lang for r in sub.collect()) <= {"en", "zh"}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mix_datasets(dc, "lang", {"en": -0.1}, "doc_id")
    with _pytest.raises(ValueError):
        mix_datasets(dc, "lang", {"nope": 1.0}, "doc_id")
    # a PARTIALLY absent weighted domain also raises (review finding:
    # silently dropping it would return a mixture that cannot match
    # the requested composition)
    with _pytest.raises(ValueError, match="absent"):
        mix_datasets(dc, "lang", {"en": 0.5, "nope": 0.5}, "doc_id")
