"""Fleet-wide physical-plan audit over every driver query.

Enforces the engine's stated execution rules (SURVEY §4): no
row-at-a-time Python evaluation anywhere (``BatchEvalPython``), Arrow
``MapInPandas`` only in the explicitly-UDF-sanctioned multimodal decode,
and no cartesian products.
"""

import re

import pytest

import __spark_entry__ as entry_mod
from kolang_spark.plans.audit import explain_str
from tests.oracle import SF_ORACLE

QUERIES = entry_mod.queries()

# the one operator where Python is the sanctioned tool (media decode has
# no Catalyst expression); everything else must stay JVM-side
PANDAS_ALLOWED = {"multimodal_decode_fake"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_python_row_eval_and_no_cartesian(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in PANDAS_ALLOWED:
        assert not re.search(
            r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas", plan
        ), f"{name}: unexpected Python boundary"
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
