"""DataFrame → DataFrame operators (reference parity: SURVEY.md §2.2)."""

from kolang_spark.operators.asof import as_of_join  # noqa: F401
from kolang_spark.operators.rangejoin import (  # noqa: F401
    interval_overlap_join,
    point_in_interval_join,
)
from kolang_spark.operators.sampling import (  # noqa: F401
    deterministic_sample,
    mix_datasets,
    mix_datasets_temperature,
    split_dataset,
    stratified_fixed_sample,
    stratified_sample,
    top_k_per_group,
    weighted_sample,
)
from kolang_spark.operators.profile import (  # noqa: F401
    join_key_profile,
    profile_table,
    psi_drift,
)
from kolang_spark.operators.reshape import transpose, unpivot  # noqa: F401
from kolang_spark.operators.rollup import hypertable_rollup  # noqa: F401
from kolang_spark.operators.sketches import (  # noqa: F401
    approx_quantiles,
    bloom_might_contain,
    bloom_semi_join,
    bloom_table,
    cms_estimate,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_sketch,
    sketch_rollup,
)
from kolang_spark.operators.sessions import session_id, with_session_id  # noqa: F401
from kolang_spark.operators.skew import (  # noqa: F401
    salted_join,
    skew_report,
    skew_safe_distinct_count,
)
from kolang_spark.operators.trend import add_trend_line  # noqa: F401
from kolang_spark.operators.unions import safe_union, union_all  # noqa: F401
from kolang_spark.operators.normalize import standardize, winsorize  # noqa: F401
from kolang_spark.operators.robust import mad_outliers  # noqa: F401
from kolang_spark.operators.binning import equi_depth_bin  # noqa: F401
from kolang_spark.operators.resample import resample_fill  # noqa: F401
from kolang_spark.operators.layout import (  # noqa: F401
    morton_code,
    with_zorder_key,
    zorder_by,
)
from kolang_spark.operators.funnel import (  # noqa: F401
    funnel_counts,
    funnel_steps,
    retention_cohorts,
)
from kolang_spark.operators.scd import (  # noqa: F401
    scd2_apply,
    scd2_init,
    snapshot_diff,
)
from kolang_spark.operators.privacy import (  # noqa: F401
    detect_pii_columns,
    dp_noisy_counts,
    k_anonymity_report,
    k_anonymize,
)
from kolang_spark.operators.anomaly import (  # noqa: F401
    cusum_shift,
    seasonal_anomaly,
)
from kolang_spark.operators.features import (  # noqa: F401
    event_transitions,
    target_encode,
    trailing_window_agg,
)
from kolang_spark.operators.abtest import ab_test_report  # noqa: F401
from kolang_spark.operators.stats import (  # noqa: F401
    correlation_matrix,
    grouped_ols,
)
from kolang_spark.operators.attribution import attribute_conversions  # noqa: F401
from kolang_spark.operators.contracts import (  # noqa: F401
    accepted_values,
    in_range,
    matches_regex,
    not_null,
    unique,
    validate,
)
from kolang_spark.operators.graph import (  # noqa: F401
    label_propagation,
    pagerank,
)
