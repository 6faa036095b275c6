"""Scalar function library (SURVEY.md §2.8)."""

from automotive_data_pipeline_demo_spark.functions.scalars import (
    iso8601_noon,
    message_id,
    mint_user_id,
    track_event_struct,
    url_query_param,
)

__all__ = [
    "mint_user_id",
    "message_id",
    "iso8601_noon",
    "track_event_struct",
    "url_query_param",
]
