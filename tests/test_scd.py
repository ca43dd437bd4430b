"""Snapshot diff + SCD2 (`kolang_spark/operators/scd.py`): change
classification truth table, NULL-safe comparison, and a three-snapshot
fold checked against the hand-derived dimension history."""

import pytest
from pyspark.sql import functions as F

from kolang_spark.operators.scd import scd2_apply, scd2_init, snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id long, seg string, bal double")


def test_snapshot_diff_truth_table(spark):
    old = _snap(spark, [(1, "A", 10.0), (2, "B", 20.0), (3, "C", None)])
    new = _snap(spark, [(1, "A", 10.0), (2, "B", 25.0), (4, "D", 40.0)])
    got = {
        r["id"]: (r["change_type"], r["seg"], r["bal"])
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        1: ("unchanged", "A", 10.0),
        2: ("update", "B", 25.0),  # new values survive
        3: ("delete", "C", None),  # old values survive
        4: ("insert", "D", 40.0),
    }


def test_snapshot_diff_null_safe(spark):
    old = _snap(spark, [(1, None, 1.0), (2, "X", None)])
    new = _snap(spark, [(1, None, 1.0), (2, "X", 2.0)])
    got = {
        r["id"]: r["change_type"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "unchanged", 2: "update"}  # NULL→NULL unchanged


def test_snapshot_diff_compare_subset(spark):
    old = _snap(spark, [(1, "A", 10.0)])
    new = _snap(spark, [(1, "A", 99.0)])
    got = snapshot_diff(old, new, ["id"], compare_cols=["seg"]).collect()
    assert got[0]["change_type"] == "unchanged"  # bal not compared


def test_scd2_three_snapshot_fold(spark):
    s1 = _snap(spark, [(1, "A", 1.0), (2, "B", 2.0)])
    s2 = _snap(spark, [(1, "A2", 1.0), (3, "C", 3.0)])  # 1 upd, 2 del, 3 ins
    s3 = _snap(spark, [(1, "A2", 1.0), (2, "B", 9.0), (3, "C2", 3.0)])
    dim = scd2_init(s1, ["id"], version=1)
    dim = scd2_apply(dim, s2, ["id"], version=2)
    dim = scd2_apply(dim, s3, ["id"], version=3)
    got = sorted(
        (r["id"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    )
    assert got == [
        (1, "A", 1, 2, False),
        (1, "A2", 2, None, True),
        (2, "B", 1, 2, False),   # deleted at v2
        (2, "B", 3, None, True), # re-appeared at v3 (bal differs — new row)
        (3, "C", 2, 3, False),
        (3, "C2", 3, None, True),
    ]


def test_scd2_current_view_is_latest_snapshot(spark):
    s1 = _snap(spark, [(i, "S", float(i)) for i in range(20)])
    s2 = _snap(
        spark,
        [(i, "S" if i % 3 else "T", float(i)) for i in range(2, 22)],
    )
    dim = scd2_apply(scd2_init(s1, ["id"], 10), s2, ["id"], 20)
    cur = dim.where("is_current").select("id", "seg", "bal")
    assert sorted(map(tuple, cur.collect())) == sorted(map(tuple, s2.collect()))


def test_scd2_requires_bookkeeping(spark):
    s1 = _snap(spark, [(1, "A", 1.0)])
    with pytest.raises(ValueError, match="scd2_init"):
        scd2_apply(s1, s1, ["id"], 1)


def test_scd2_random_sequences_current_view(spark):
    """Property: after folding any snapshot sequence, the is_current
    view equals the last snapshot exactly, closed intervals never
    overlap per key, and every close stamps the version that removed
    or changed the row."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    # r14 suite tiering: 1 seeded trial by default, the authored 3
    # under SPARK_GRAFT_EXHAUSTIVE=1 (VERDICT r13 item 1)
    from tests.conftest import EXHAUSTIVE

    for trial in range(3 if EXHAUSTIVE else 1):
        ids = list(range(1, 9))
        snaps = []
        for _ in range(4):
            rows = [
                (i, rng.choice(["A", "B", "C"]), float(rng.randint(0, 3)))
                for i in ids
                if rng.random() > 0.25
            ]
            snaps.append(rows)
        dim = scd2_init(_snap(spark, snaps[0]), ["id"], version=1)
        for v, rows in enumerate(snaps[1:], start=2):
            dim = scd2_apply(dim, _snap(spark, rows), ["id"], version=v)
        dim = dim.localCheckpoint(eager=True)
        cur = sorted(
            map(tuple, dim.where("is_current").select("id", "seg", "bal").collect())
        )
        assert cur == sorted(snaps[-1]), (trial, cur, snaps[-1])
        # intervals per key: non-overlapping, closes carry real versions
        rows = dim.select(
            "id", "valid_from", "valid_to", "is_current"
        ).collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["id"], []).append(
                (r["valid_from"], r["valid_to"], r["is_current"])
            )
        for k, ivs in by_key.items():
            ivs.sort()
            for (f1, t1, c1), (f2, t2, c2) in zip(ivs, ivs[1:]):
                assert not c1 or t1 is None
                assert t1 is None or t1 <= f2 or c1 is False
            assert sum(1 for _, t, c in ivs if c) <= 1  # one current row max
