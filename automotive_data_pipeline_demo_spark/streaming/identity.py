"""Two-tier identity resolution: session-id join + contact/time fallback.

Reference parity (identity-resolution/api-server.js:247-260, README.md:84-88):
tier 1 matches a CRM lead to a visitor session on the shared digital-
retailing session id within 24 h; tier 2 falls back to normalized
email/phone near the lead timestamp; unmatched leads are retained
(is_matched=false) for later/manual matching (ST9,
database-schema.sql:344-357).

Batch formulation (the oracle-testable core) + a structured-streaming twin
(watermarked stream-stream join). Matching order is faithful: session_id
first, email_phone only for leads tier 1 missed.

Scale notes: both tiers are equi-joins (session id; lower(email)) with the
time window evaluated inside the join — never a cross product. The
fallback's candidate space is bounded by the contact key's cardinality;
dedup-to-best-candidate runs on the joined (small) output. Streaming state
is bounded by the 24 h watermark on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators.cleaning import clean_email, clean_phone

MATCH_WINDOW_HOURS = 24


def _best_match_per_lead(matched: DataFrame) -> DataFrame:
    """Closest session in time wins; visitor id breaks exact ties."""
    w = Window.partitionBy("lead_id").orderBy(
        F.abs(
            F.unix_micros("lead_submitted_at") - F.unix_micros("session_first_seen")
        ).asc(),
        F.col("visitor_id").asc(),
    )
    return (
        matched.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def resolve_identities_batch(
    visitors: DataFrame, leads: DataFrame, window_hours: int = MATCH_WINDOW_HOURS
) -> DataFrame:
    """Match every lead to at most one visitor session.

    visitors: (visitor_id, session_id, email, phone, first_seen)
    leads:    (lead_id, session_id, email, phone, lead_submitted_at)
    Returns one row per lead: match_method in
    ('session_id', 'email_phone', NULL=unmatched), matched visitor_id.
    """
    win_us = window_hours * 3600 * 1_000_000

    v = visitors.select(
        F.col("visitor_id"),
        F.col("session_id").alias("v_session_id"),
        clean_email(F.col("email")).alias("v_email"),
        clean_phone(F.col("phone")).alias("v_phone"),
        F.col("first_seen").alias("session_first_seen"),
    )
    l = leads.select(
        F.col("lead_id"),
        F.col("session_id").alias("l_session_id"),
        clean_email(F.col("email")).alias("l_email"),
        clean_phone(F.col("phone")).alias("l_phone"),
        F.col("lead_submitted_at"),
    )

    # tier 1: shared session id, lead within the window after session start
    t1 = l.filter(F.col("l_session_id").isNotNull()).join(
        v.filter(F.col("v_session_id").isNotNull()),
        (F.col("l_session_id") == F.col("v_session_id"))
        & (F.unix_micros("lead_submitted_at") - F.unix_micros("session_first_seen")
           ).between(-win_us, win_us),
        "inner",
    )
    t1_best = _best_match_per_lead(t1).select(
        "lead_id", "visitor_id",
        F.lit("session_id").alias("match_method"),
        "session_first_seen",
    )

    # tier 2: contact fallback for leads tier 1 missed. The reference's
    # "email OR phone" predicate is deliberately split into TWO equi-joins
    # united afterwards: an OR of equalities has no single join key, so
    # Spark would plan a CartesianProduct — a non-starter at scale. Each
    # branch hash/sort-merge-joins on its key; _best_match_per_lead then
    # collapses multi-branch hits to the nearest session, which is exactly
    # the OR-join's semantics.
    unmatched = l.join(t1_best.select("lead_id"), "lead_id", "left_anti")
    time_ok = (
        F.abs(F.unix_micros("lead_submitted_at") - F.unix_micros("session_first_seen"))
        <= win_us
    )
    t2_email = unmatched.filter(F.col("l_email").isNotNull()).join(
        v.filter(F.col("v_email").isNotNull()),
        (F.col("l_email") == F.col("v_email")) & time_ok,
        "inner",
    )
    t2_phone = unmatched.filter(F.col("l_phone").isNotNull()).join(
        v.filter(F.col("v_phone").isNotNull()),
        (F.col("l_phone") == F.col("v_phone")) & time_ok,
        "inner",
    )
    t2 = t2_email.unionByName(t2_phone)
    t2_best = _best_match_per_lead(t2).select(
        "lead_id", "visitor_id",
        F.lit("email_phone").alias("match_method"),
        "session_first_seen",
    )

    matches = t1_best.unionByName(t2_best)
    return (
        l.select("lead_id", "lead_submitted_at")
        .join(matches, "lead_id", "left")
        .select(
            "lead_id",
            "visitor_id",
            "match_method",
            F.col("match_method").isNotNull().alias("is_matched"),
            F.when(
                F.col("match_method").isNotNull(), F.col("lead_submitted_at")
            ).alias("matched_at"),
        )
    )


def streaming_session_match(
    visitor_stream: DataFrame,
    lead_stream: DataFrame,
    window_hours: int = MATCH_WINDOW_HOURS,
) -> DataFrame:
    """ST4: watermarked stream-stream inner join on session id.

    Both sides keep ``window_hours`` of state; late leads within the
    watermark still match (ST9). The email/phone fallback tier runs as a
    periodic batch over the unmatched table (resolve_identities_batch) —
    the two-tier ordering can't be expressed in one streaming join without
    unbounded state.
    """
    v = (
        visitor_stream.withWatermark("first_seen", f"{window_hours} hours")
        .select(
            F.col("visitor_id"),
            F.col("session_id").alias("v_session_id"),
            F.col("first_seen"),
        )
        .filter(F.col("v_session_id").isNotNull())
    )
    l = (
        lead_stream.withWatermark("lead_submitted_at", f"{window_hours} hours")
        .filter(F.col("session_id").isNotNull())
    )
    return l.join(
        v,
        (F.col("session_id") == F.col("v_session_id"))
        & (F.col("lead_submitted_at") >= F.col("first_seen"))
        & (
            F.col("lead_submitted_at")
            <= F.col("first_seen") + F.expr(f"INTERVAL {window_hours} HOURS")
        ),
        "inner",
    ).select(
        "lead_id", "visitor_id",
        F.lit("session_id").alias("match_method"),
        "lead_submitted_at",
    )
