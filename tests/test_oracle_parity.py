"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB at sf0.01 (rowcount + schema + values)."""

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import SF_ORACLE, compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    ok, msg = compare(df, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
