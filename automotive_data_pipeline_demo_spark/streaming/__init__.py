"""Streaming / incremental semantics (SURVEY.md §2.9, ST1-ST9)."""

from automotive_data_pipeline_demo_spark.streaming.activation import (
    build_track_events,
    emit_new_events,
)
from automotive_data_pipeline_demo_spark.streaming.identity import (
    resolve_identities_batch,
    streaming_session_match,
)
from automotive_data_pipeline_demo_spark.streaming.sessions import (
    capped_sessions_stream,
    session_rollup_stream,
    sessionize_capped,
)
from automotive_data_pipeline_demo_spark.streaming.dedup import (
    streaming_dedup_ingest,
    streaming_exact_dedup,
)
from automotive_data_pipeline_demo_spark.streaming.upsert import streaming_upsert

__all__ = [
    "build_track_events",
    "emit_new_events",
    "resolve_identities_batch",
    "streaming_session_match",
    "session_rollup_stream",
    "sessionize_capped",
    "capped_sessions_stream",
    "streaming_upsert",
    "streaming_dedup_ingest",
    "streaming_exact_dedup",
]
