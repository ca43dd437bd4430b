"""Sources & sinks: testdata readers, parquet memoization, pandas bridge."""

from kolang_spark.sources.bucketing import (  # noqa: F401
    assert_no_shuffle_join,
    write_bucketed,
)
from kolang_spark.sources.io import (  # noqa: F401
    load_or_calculate_parquet,
    overwrite_partitions,
    pandas_to_spark,
    read_csv,
    read_blobs,
    read_json,
    upsert_partitioned,
    read_table,
    write_table,
)
from kolang_spark.sources.state import (  # noqa: F401
    check_state_meta,
    ensure_state_pinned,
    pin_state_meta,
    read_state_meta,
    state_meta_path,
)
