"""Session activity tracking (ST5) and rolling analytics (ST8) as
Structured Streaming jobs.

Reference parity: visitor sessions carry first_seen/last_seen/duration
(identity-resolution/database-schema.sql:56-58), re-captured every 30 s by
the browser tracker; match_analytics is the daily/hourly rollup cache
(:196-229). Here: ``session_window`` aggregation with a watermark (state
bounded by gap + watermark), and a two-grain windowed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows: first/last seen, duration, event count.

    Works identically over a batch DataFrame (session_window is supported
    in batch) — the batch twin is what the oracle checks (catalog
    st5_sessionization expresses the same semantics via lag+cumsum).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"),
        F.col(user_col),
    ).agg(
        F.min(ts_col).alias("first_seen"),
        F.max(ts_col).alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
        ((F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))) / 60_000_000.0
         ).alias("session_duration_minutes"),
    )


def match_analytics_breakdown(
    matches: DataFrame,
    ts_col: str = "matched_at",
    method_col: str = "match_method",
) -> DataFrame:
    """Two-grain rollup with per-key breakdown maps — the JSONB
    ``utm_source_breakdown`` / ``match_method_breakdown`` columns of
    match_analytics (identity-resolution/database-schema.sql:211-213).

    The breakdown is built from pre-aggregated (period, method) counts, so
    every exchange carries one row per (day, hour, method) — never raw
    match rows — and the daily grain re-aggregates the hourly partials
    instead of rescanning the input. The map is rendered as an ordered
    ``method:count`` comma-joined string (catalog determinism rule: map and
    array outputs are strings with an explicit element order).
    """
    base = (
        matches.select(
            F.to_date(ts_col).alias("date_period"),
            F.hour(ts_col).alias("hour_period"),
            F.col(method_col).alias("method"),
        )
        .groupBy("date_period", "hour_period", "method")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def fold(grouped) -> DataFrame:
        return grouped.agg(
            F.sum("cnt").alias("total_matches"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("method", "cnt"))),
                    lambda s: F.concat_ws(
                        ":", s["method"], s["cnt"].cast("string")
                    ),
                ),
            ).alias("method_breakdown"),
        )

    hourly = fold(base.groupBy("date_period", "hour_period")).select(
        "date_period", "hour_period", "total_matches", "method_breakdown"
    )
    daily = fold(
        base.groupBy("date_period", "method")
        .agg(F.sum("cnt").alias("cnt"))
        .groupBy("date_period")
    ).select(
        "date_period",
        F.lit(None).cast("int").alias("hour_period"),
        "total_matches",
        "method_breakdown",
    )
    return hourly.unionByName(daily)


def match_analytics_rollup(
    matches: DataFrame,
    ts_col: str = "matched_at",
) -> DataFrame:
    """A9 two-grain rollup: daily rows (hour_period NULL) + hourly rows —
    the match_analytics cache, expressed as ROLLUP(date, hour)."""
    return (
        matches.select(
            F.to_date(ts_col).alias("date_period"),
            F.hour(ts_col).alias("hour_period"),
            "match_method",
        )
        .rollup("date_period", "hour_period")
        .agg(
            F.count(F.lit(1)).alias("total_matches"),
            F.count(F.when(F.col("match_method") == "session_id", 1)).alias(
                "session_id_matches"
            ),
            F.count(F.when(F.col("match_method") == "email_phone", 1)).alias(
                "email_phone_matches"
            ),
        )
        .filter(F.col("date_period").isNotNull())
    )
