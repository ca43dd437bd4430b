"""Physical-plan audit helpers (no custom Catalyst rules — SURVEY §4).

The engine adds **zero** custom optimizer rules or strategies: every
operator is stock Catalyst algebra. What this module provides instead is
*verification* that plans keep the properties the operators promise:

* no Python evaluation nodes in core paths (codegen stays intact);
* filters/projections reach the parquet scan (pushdown/pruning);
* detection of single-partition windows (the global-window hazard).

Used by tests and by ``bench.py`` plan audits.
"""

from kolang_spark.plans.audit import (  # noqa: F401
    explain_str,
    find_global_windows,
    has_python_eval,
    pushed_filters,
    read_schema_columns,
)
