"""Round-8 operator tests: quality-aware dedup keep-policy."""

import pytest
from pyspark.sql import functions as F

from kolang_spark.llm.dedup import dedup_keep_best


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score long")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _run(spark, rows, pairs, **kw):
    out = dedup_keep_best(
        _mk(spark, rows), _pairs(spark, pairs), score="score", **kw
    )
    return {
        r["doc_id"]: (r["component"], r["score"], r["keep"])
        for r in out.collect()
    }


def test_keeps_highest_score_in_chain_cluster(spark):
    # 1-2 and 2-3 chain into one cluster even though 1-3 never paired
    got = _run(spark, [(1, 10), (2, 99), (3, 50), (9, 7)], [(1, 2), (2, 3)])
    assert got[2][2] is True and got[1][2] is False and got[3][2] is False
    assert got[1][0] == got[2][0] == got[3][0]
    assert got[9] == (9, 7, True)  # singleton keeps itself


def test_tie_breaks_to_min_id(spark):
    got = _run(spark, [(5, 40), (6, 40), (7, 10)], [(5, 6), (6, 7)])
    assert got[5][2] is True and got[6][2] is False and got[7][2] is False


def test_prefer_min_keeps_lowest(spark):
    got = _run(spark, [(1, 10), (2, 99)], [(1, 2)], prefer="min")
    assert got[1][2] is True and got[2][2] is False


def test_null_scores_lose_to_scored_rows(spark):
    rows = [(1, None), (2, 5), (3, None)]
    got = _run(spark, rows, [(1, 2), (2, 3)])
    assert got[2][2] is True and not got[1][2] and not got[3][2]


def test_all_null_cluster_falls_back_to_min_id(spark):
    got = _run(spark, [(4, None), (8, None)], [(4, 8)])
    assert got[4][2] is True and got[8][2] is False


def test_exactly_one_keeper_per_component(spark):
    rows = [(i, i % 3) for i in range(12)]
    pairs = [(i, i + 1) for i in range(0, 10, 2)]  # clusters {0,1},{2,3},...
    got = _run(spark, rows, pairs)
    by_comp = {}
    for doc, (comp, _, keep) in got.items():
        by_comp.setdefault(comp, 0)
        by_comp[comp] += int(keep)
    assert all(v == 1 for v in by_comp.values())


def test_invalid_prefer_raises(spark):
    with pytest.raises(ValueError):
        dedup_keep_best(
            _mk(spark, [(1, 1)]), _pairs(spark, []), score="score",
            prefer="median",
        )


def test_score_as_column_expression(spark):
    df = spark.createDataFrame(
        [(1, "short"), (2, "a much longer text")], "doc_id long, text string"
    )
    out = dedup_keep_best(
        df, _pairs(spark, [(1, 2)]), score=F.length("text"),
        score_col="n_chars",
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[2]["keep"] is True and got[2]["n_chars"] == 18
