"""Scalar expression builders — all native column expressions, no UDFs.

Reference parity:
- F1 user-id minting ``CONCAT('AUTO-', custno)`` (``sql/customer_360_views.sql:85``)
- F18 md5 message-id minting, 50-char cap
  (``scripts/lambda_redshift_to_segment.py:316-325``)
- F19 ISO8601 "noon pad" timestamp formatting
  (``scripts/lambda_redshift_to_segment.py:341-356``)
- F20 nested Track-event JSON assembly
  (``scripts/lambda_redshift_to_segment.py:358-418``)
- F23 URL query-param extraction (``identity-resolution/website-tracker.js:104-120``)
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def mint_user_id(customer_no: Column | str, prefix: str = "AUTO-") -> Column:
    """F1: stable synthetic user id from the CRM customer number."""
    return F.concat(F.lit(prefix), _c(customer_no).cast("string"))


def message_id(*parts: Column | str, prefix: str = "vp_", max_len: int = 50) -> Column:
    """F18: idempotency key = prefix + md5("_"-joined parts), capped at 50.

    Deterministic per business key, so re-delivered rows dedup downstream
    (exactly-once via key, ST2).
    """
    joined = F.concat_ws("_", *[_c(p).cast("string") for p in parts])
    return F.substring(F.concat(F.lit(prefix), F.md5(joined)), 1, max_len)


def iso8601_noon(ts: Column | str) -> Column:
    """F19: date-only timestamps rendered as ISO8601 pinned to 12:00:00Z.

    The reference pads date-only purchase dates to noon UTC so downstream
    systems don't shift the calendar day across timezones.
    """
    return F.date_format(_c(ts), "yyyy-MM-dd'T'12:00:00'Z'")


def url_query_param(url: Column | str, param: str) -> Column:
    """F23: pull one query parameter from a URL (utm_source, gclid, ...)."""
    return F.parse_url(_c(url).cast("string"), F.lit("QUERY"), F.lit(param))


def track_event_struct(
    user_id: Column,
    event_name: str,
    msg_id: Column,
    timestamp: Column,
    properties: Mapping[str, Column],
    source: str = "automotive_data_pipeline_demo_spark",
) -> Column:
    """F20: the nested Segment-style Track event.

    Shape mirrors ``scripts/lambda_redshift_to_segment.py:358-418``:
    {type, messageId, userId, event, timestamp, properties{...}, context{...}}.
    Render with ``F.to_json`` for the wire format.
    """
    props = F.struct(*[v.alias(k) for k, v in properties.items()])
    context = F.struct(
        F.struct(
            F.lit("automotive_data_pipeline_demo_spark").alias("name"),
            F.lit("0.1.0").alias("version"),
        ).alias("library"),
        F.lit(source).alias("source"),
    )
    return F.struct(
        F.lit("track").alias("type"),
        msg_id.alias("messageId"),
        user_id.alias("userId"),
        F.lit(event_name).alias("event"),
        timestamp.alias("timestamp"),
        props.alias("properties"),
        context.alias("context"),
    )
