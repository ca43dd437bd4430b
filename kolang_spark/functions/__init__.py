"""Column-expression operators (reference parity: SURVEY.md §2.1).

Everything here is pure Catalyst expression algebra — no Python UDFs —
so whole-stage codegen, predicate pushdown, and column pruning see
through every operator.
"""

from kolang_spark.functions.core import (  # noqa: F401
    array_contains_column,
    bin,
    col,
    cond_count,
    condition_count,
    count_distinct_with_nulls,
    cube_percent,
    cumulative_percent,
    cumulative_sum,
    is_null_or_in,
    median,
    quantiles,
    moving_average,
    moving_avg,
    percent,
    str_to_column,
    sum_columns,
    weighted_average,
    weighted_avg,
)
from kolang_spark.functions.jalali import (  # noqa: F401
    gregorian_date,
    jalali_date,
    parse_jalali,
)
from kolang_spark.functions.json import json_get, json_map  # noqa: F401
from kolang_spark.functions.text import (  # noqa: F401
    number_normalizer,
    persian_number,
    str_array_to_array,
    text_cleaner,
)
