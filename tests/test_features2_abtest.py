"""target_encode + event_transitions (`operators/features.py`) and
ab_test_report (`operators/abtest.py`): formula replicas and edge
cases."""

import math

import pytest
from pyspark.sql import functions as F

from kolang_spark.operators.abtest import ab_test_report
from kolang_spark.operators.features import event_transitions, target_encode


# ---------- target_encode ----------


def test_target_encode_plain_mean(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("b", 10), (None, 7), (None, 9)],
        "cat string, y long",
    )
    got = {
        (r["cat"], r["y"]): r["cat_te"]
        for r in target_encode(df, "cat", "y").collect()
    }
    assert got[("a", 1)] == got[("a", 3)] == pytest.approx(2.0)
    assert got[("b", 10)] == pytest.approx(10.0)
    assert got[(None, 7)] == pytest.approx(8.0)  # NULL cat is a group


def test_target_encode_loo(spark):
    df = spark.createDataFrame(
        [("a", 2), ("a", 4), ("a", 6), ("b", 5)], "cat string, y long"
    )
    got = {
        (r["cat"], r["y"]): r["cat_te"]
        for r in target_encode(df, "cat", "y", leave_one_out=True).collect()
    }
    assert got[("a", 2)] == pytest.approx(5.0)  # (4+6)/2
    assert got[("a", 4)] == pytest.approx(4.0)
    assert got[("b", 5)] is None  # singleton, nothing left


def test_target_encode_smoothing(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 1)], "cat string, y long"
    )
    prior = 2 / 3
    got = {
        r["cat"]: r["cat_te"]
        for r in target_encode(df, "cat", "y", smoothing=2)
        .select("cat", "cat_te")
        .distinct()
        .collect()
    }
    assert got["a"] == pytest.approx((1 + 2 * prior) / (2 + 2))
    assert got["b"] == pytest.approx((1 + 2 * prior) / (1 + 2))


def test_target_encode_null_target_gets_encoding(spark):
    df = spark.createDataFrame(
        [("a", 4), ("a", None)], "cat string, y int"
    )
    got = {
        r["y"]: r["cat_te"] for r in target_encode(df, "cat", "y").collect()
    }
    assert got[None] == pytest.approx(4.0)  # excluded from stats, encoded


def test_target_encode_all_null_category_shrinks_to_prior(spark):
    """A category whose targets are ALL NULL has n=0: with smoothing it
    must encode the prior exactly ((0 + m·prior)/(0 + m)), not NULL
    (advisor finding r9 — SUM over zero non-NULL rows is NULL and used
    to poison the numerator); without smoothing it stays NULL."""
    df = spark.createDataFrame(
        [("a", 10), ("a", 30), ("r", None), ("r", None)], "cat string, y int"
    )
    prior = 20.0
    sm = {r["cat"]: r["cat_te"] for r in target_encode(df, "cat", "y", smoothing=2).collect()}
    assert sm["r"] == pytest.approx(prior)
    plain = {r["cat"]: r["cat_te"] for r in target_encode(df, "cat", "y").collect()}
    assert plain["r"] is None


# ---------- event_transitions ----------


def test_event_transitions_counts_and_probs(spark):
    rows = [
        (1, 0, "A"), (1, 1, "B"), (1, 2, "A"), (1, 3, "B"),
        (2, 0, "A"), (2, 1, "C"),
    ]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p_micro"])
        for r in event_transitions(df, ["uid"], "t", "s").collect()
    }
    # from A: A→B twice, A→C once
    assert got[("A", "B")] == (2, 666666)
    assert got[("A", "C")] == (1, 333333)
    assert got[("B", "A")] == (1, 1000000)


def test_event_transitions_rejects_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, "A"), (1, 5, "B")], "uid long, t long, s string"
    )
    with pytest.raises(Exception, match="tied"):
        event_transitions(df, ["uid"], "t", "s").collect()


def test_event_transitions_tiebreak_col(spark):
    df = spark.createDataFrame(
        [(1, 5, 0, "A"), (1, 5, 1, "B")], "uid long, t long, i long, s string"
    )
    got = event_transitions(df, ["uid"], "t", "s", order_cols=["i"]).collect()
    assert [(r["from_state"], r["to_state"]) for r in got] == [("A", "B")]


# ---------- ab_test_report ----------


def test_ab_test_report_formulas(spark):
    rows = (
        [("control", 1)] * 40 + [("control", 0)] * 60
        + [("treat", 1)] * 55 + [("treat", 0)] * 45
    )
    df = spark.createDataFrame(rows, "variant string, conv int")
    got = {
        r["variant"]: r
        for r in ab_test_report(df, "variant", "conv", "control").collect()
    }
    c, t = got["control"], got["treat"]
    assert (c["n"], c["x"], c["rate"]) == (100, 40, pytest.approx(0.4))
    assert c["lift"] is None and c["z"] is None
    assert (t["n"], t["x"]) == (100, 55)
    assert t["lift"] == pytest.approx(0.15)
    pooled = 95 / 200
    want_z = (0.55 - 0.40) / math.sqrt(pooled * (1 - pooled) * (2 / 100))
    assert t["z"] == pytest.approx(want_z)


def test_ab_test_null_success_counts_exposure(spark):
    df = spark.createDataFrame(
        [("c", None), ("c", 1), ("t", 1)], "variant string, conv int"
    )
    got = {r["variant"]: r for r in ab_test_report(df, "variant", "conv", "c").collect()}
    assert got["c"]["n"] == 2 and got["c"]["x"] == 1


def test_ab_test_missing_control_raises(spark):
    df = spark.createDataFrame([("t", 1)], "variant string, conv int")
    with pytest.raises(ValueError, match="control"):
        ab_test_report(df, "variant", "conv", "nope")


def test_ab_test_degenerate_pooled_rate(spark):
    df = spark.createDataFrame(
        [("c", 0), ("c", 0), ("t", 0)], "variant string, conv int"
    )
    got = {r["variant"]: r for r in ab_test_report(df, "variant", "conv", "c").collect()}
    assert got["t"]["z"] is None  # pooled rate 0 → no variance to test


def test_target_encode_units_exact_integer(spark):
    """r11: units=k emits the encoding as an exact LONG in 1/k units
    (the p_micro idiom) — all-integer arithmetic, no double anywhere."""
    import pytest

    from kolang_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 200), (3, "a", 250), (4, "b", 70)],
        ["id", "cat", "cents"],
    )
    out = {
        r.id: r.cat_te
        for r in target_encode(
            df, "cat", "cents", leave_one_out=True, units=1_000_000
        ).collect()
    }
    # LOO means: id1 -> (200+250)/2, id2 -> (100+250)/2, id3 -> 150
    assert out[1] == 225_000_000
    assert out[2] == 175_000_000
    assert out[3] == 150_000_000
    assert out[4] is None  # singleton: nothing left to average
    # dtype is LONG, not double
    enc = target_encode(df, "cat", "cents", units=1000)
    assert dict(enc.dtypes)["cat_te"] == "bigint"
    assert {
        r.id: r.cat_te for r in enc.collect()
    }[4] == 70_000  # plain mean, 1/1000 units
    # units requires smoothing=0
    with pytest.raises(ValueError, match="units"):
        target_encode(df, "cat", "cents", smoothing=2, units=1000)


def test_target_encode_units_survives_huge_sums(spark):
    """The naive num·units DIV den overflows LONG once a group's sum
    passes 2^63/units (~9.2e12 micro-units — reachable at 100 TB group
    sizes); the overflow-safe decomposition q·u + (r·u) DIV den must
    stay exact there."""
    from kolang_spark.operators.features import target_encode

    big = 5_000_000_000_000  # 5e12 cents per row; LOO sum 1e13
    df = spark.createDataFrame(
        [(1, "a", big), (2, "a", big), (3, "a", big)],
        ["id", "cat", "cents"],
    )
    out = {
        r.id: r.cat_te
        for r in target_encode(
            df, "cat", "cents", leave_one_out=True, units=1_000_000
        ).collect()
    }
    # (2·5e12)/2 = 5e12 cents -> 5e18 micro-units; the naive product
    # 1e13·1e6 = 1e19 > 2^63-1 would have wrapped negative
    assert out[1] == 5_000_000_000_000_000_000
    assert out[1] > 0


def test_target_encode_units_unrepresentable_result_fails_loudly(spark):
    """When the TRUE result mean*units itself exceeds int64 (no
    correct long exists), the units mode must fail loudly — found by
    the hypothesis model's original unbounded generator (a lone
    9_223_372_036_855-cent row at units=1e6). Advisor r12: the
    original guard was ANSI's ARITHMETIC_OVERFLOW, which this
    package's default sessions never enable — under ANSI-off the
    'exact' encoding silently wrapped to a garbage negative long. The
    in-plan raise_error guard must fire under the DEFAULT config (no
    ANSI flip here, deliberately)."""
    import pytest

    from kolang_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [(1, "a", 9_223_372_036_855)], ["id", "cat", "cents"]
    )
    with pytest.raises(Exception, match="(?i)overflow"):
        target_encode(df, "cat", "cents", units=1_000_000).collect()
    # a huge GROUP SIZE wraps the remainder term r·u even when the
    # mean is tiny — the den-side guard covers it; can't materialize
    # 9e12 rows in a test, so this asserts the guard bound only via
    # the q-side twin above (den path shares the expression).
    # Representable values adjacent to the boundary still work:
    ok = target_encode(
        spark.createDataFrame([(1, "a", 9_000_000_000_000)], ["id", "cat", "cents"]),
        "cat",
        "cents",
        units=1_000_000,
    ).collect()
    assert ok[0].cat_te == 9_000_000_000_000_000_000


def test_target_encode_units_rejects_non_integral_target(spark):
    """Review r11: units mode on a double column would silently
    truncate every value toward zero (cast long, ANSI off) and emit a
    confidently exact-looking but wrong encoding — the documented
    integral-target precondition is now enforced."""
    import pytest

    from kolang_spark.operators.features import target_encode

    df = spark.createDataFrame(
        [(1, "a", 0.9), (2, "a", 0.9)], ["id", "cat", "score"]
    )
    with pytest.raises(ValueError, match="integral"):
        target_encode(df, "cat", "score", units=1000)
    # the double path (no units) still works on doubles
    out = target_encode(df, "cat", "score").collect()
    assert abs(out[0].cat_te - 0.9) < 1e-12
