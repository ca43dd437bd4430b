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


def test_cms_exact_when_collision_free(spark):
    from kolang_spark.operators import cms_estimate, cms_table

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    cms = cms_table(df, "k", depth=4, width=4096)
    est = {
        r.item: r.est_count
        for r in cms_estimate(cms, df.distinct(), "k", depth=4, width=4096).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 1}


def test_cms_overestimates_only_and_merges(spark):
    import pyspark.sql.functions as F

    from kolang_spark.operators import cms_estimate, cms_table

    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    true = {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}

    # tiny width forces collisions -> estimates may exceed, never undercut
    cms = cms_table(df, "k", depth=3, width=4)
    est = {
        r.item: r.est_count
        for r in cms_estimate(cms, df.distinct(), "k", depth=3, width=4).collect()
    }
    assert all(est[k] >= true[k] for k in true)

    # merge algebra: sum of half-sketches == whole sketch
    h1 = spark.createDataFrame(rows[:100], "k string")
    h2 = spark.createDataFrame(rows[100:], "k string")
    c1, c2 = cms_table(h1, "k", depth=3, width=4), cms_table(h2, "k", depth=3, width=4)
    merged = (
        c1.unionByName(c2)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r.row, r.bucket): r.cnt for r in cms_table(df, "k", depth=3, width=4).collect()}
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == whole

    import pytest as _pytest

    with _pytest.raises(ValueError):
        cms_table(df, "k", depth=0)


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom contract: every inserted value probes true (no false
    negatives), merge = union.distinct of bit tables equals the
    direct filter, NULLs excluded, duplicates collapse."""
    from kolang_spark.operators import bloom_might_contain, bloom_table

    a = spark.createDataFrame([(f"u{i}",) for i in range(40)], "x string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(40)] + [(None,)], "x string")
    fa = bloom_table(a, "x", n_bits=256, k=3)
    fb = bloom_table(b, "x", n_bits=256, k=3)
    merged = fa.union(fb).distinct()
    direct = bloom_table(a.union(b), "x", n_bits=256, k=3)
    assert sorted(r.bit for r in merged.collect()) == sorted(
        r.bit for r in direct.collect()
    )
    probe = a.union(b).union(
        spark.createDataFrame([(f"w{i}",) for i in range(200)], "x string")
    )
    got = {
        r.item: r.might_contain
        for r in bloom_might_contain(merged, probe, "x", n_bits=256, k=3).collect()
    }
    assert None not in got
    assert all(got[f"u{i}"] and got[f"v{i}"] for i in range(40))
    # with 80*3 bits over 256, absent keys must include SOME negatives
    # (the filter would be useless if everything probed true)
    assert any(not got[f"w{i}"] for i in range(200))

    with pytest.raises(ValueError):
        bloom_table(a, "x", n_bits=1)
