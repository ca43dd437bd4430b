"""Structured Streaming surface (extension — the reference is batch-only,
SURVEY §2.3 'Streaming')."""

from kolang_spark.streaming.dedup import dedup_stream  # noqa: F401
from kolang_spark.streaming.joins import interval_join  # noqa: F401
from kolang_spark.streaming.sessions import sessionize  # noqa: F401
from kolang_spark.streaming.sinks import (  # noqa: F401
    cms_sink,
    cms_state,
    cms_state_params,
    embedding_dedup_sink,
    line_dedup_sink,
    minhash_dedup_sink,
    upsert_sink,
)
from kolang_spark.streaming.stateful import ewma_batch, stateful_ewma  # noqa: F401
from kolang_spark.streaming.windows import sliding, tumbling  # noqa: F401
