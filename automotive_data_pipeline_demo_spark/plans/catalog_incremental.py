"""Incremental / sessionization semantics, batch-expressible (SURVEY §2.9).

Split out of ``plans/catalog.py`` purely mechanically (same specs, same
registration order — the hub imports the family modules in the original
section sequence, and each module registers its specs in original order).
Shared helpers and the spec registry live on the hub.
"""

from automotive_data_pipeline_demo_spark.plans.catalog import *  # noqa: F401,F403
from automotive_data_pipeline_demo_spark.plans.catalog import (  # noqa: F401
    _cents,
    _dec_sum,
    _register,
    _t,
)


# --------------------------------------------------------------------------
# Incremental / sessionization semantics, batch-expressible (SURVEY §2.9)
# --------------------------------------------------------------------------

def q_st5_sessionization(spark: SparkSession, sf: str) -> DataFrame:
    """ST5: session windows — gap > 30 min starts a new session; per-user
    session count and duration stats (first_seen/last_seen/duration,
    identity-resolution/database-schema.sql:56-58). Batch formulation:
    lag + cumulative gap-count; the streaming twin uses session_window.
    """
    ev = _t(spark, sf, "events")
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gapped = ev.withColumn("prev_ts", F.lag("ts").over(w_user)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.unix_micros("ts") - F.unix_micros("prev_ts") > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = gapped.withColumn(
        "session_no",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum(
            F.unix_micros("last_seen") - F.unix_micros("first_seen")
        ).cast("long").alias("total_session_us"),
    )


_register(QuerySpec(
    name="st5_sessionization",
    survey="ST5",
    build=q_st5_sessionization,
    oracle="""
        WITH gapped AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), numbered AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                        ROWS UNBOUNDED PRECEDING) AS session_no
          FROM gapped
        ), per_session AS (
          SELECT user_id, session_no, MIN(ts) AS first_seen, MAX(ts) AS last_seen,
                 COUNT(*) AS n_events
          FROM numbered GROUP BY 1, 2
        )
        SELECT user_id, COUNT(*) AS n_sessions,
               CAST(MAX(n_events) AS BIGINT) AS max_session_events,
               CAST(SUM(epoch_us(last_seen) - epoch_us(first_seen)) AS BIGINT)
                 AS total_session_us
        FROM per_session GROUP BY user_id
    """,
    bench=True,
    tags=("window", "session"),
))


def q_st8_rolling_window(spark: SparkSession, sf: str) -> DataFrame:
    """ST8: trailing 7-day rolling aggregates at daily grain
    (identity-resolution/database-schema.sql:304-317).
    """
    ev = _t(spark, sf, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        _dec_sum("value", "day_value"),
    )
    # The unpartitioned window serializes ONLY the daily-grain frame (one
    # row per calendar day — bounded by the calendar, not the corpus); the
    # heavy events->daily aggregation above it is fully partitioned. This
    # is the catalog's single allowed Exchange SinglePartition
    # (locked by test_single_partition_only_on_calendar_grain).
    w7 = (
        Window.orderBy(F.col("event_day").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "event_day",
        "n_events",
        F.sum("n_events").over(w7).cast("long").alias("events_7d"),
        F.round(F.sum("day_value").over(w7), 2).alias("value_7d"),
    )


_register(QuerySpec(
    name="st8_rolling_window",
    survey="ST8,A9",
    build=q_st8_rolling_window,
    oracle="""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS event_day, COUNT(*) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
          FROM events GROUP BY 1
        )
        SELECT event_day, n_events,
               CAST(SUM(n_events) OVER w AS BIGINT) AS events_7d,
               ROUND(SUM(day_value) OVER w, 2) AS value_7d
        FROM daily
        WINDOW w AS (ORDER BY event_day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "rolling"),
))


