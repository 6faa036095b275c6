"""Scalar function families (SURVEY §2.8).

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
# Scalar function families (SURVEY §2.8)
# --------------------------------------------------------------------------

def q_f_strings(spark: SparkSession, sf: str) -> DataFrame:
    """F1/F2/F3/F6: concat minting, case/trim normalizers, regex strip,
    length — the contact-cleaning expression kit
    (sql/customer_360_views.sql:85-116).
    """
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        mint_user_id("c_custkey").alias("user_id"),
        F.lower(F.trim(F.col("c_name"))).alias("name_lower"),
        F.upper(F.col("c_mktsegment")).alias("segment_upper"),
        F.regexp_replace("c_name", r"[^0-9]", "").alias("name_digits"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws(" ", F.col("c_mktsegment"), F.col("c_name")).alias("trade_desc"),
    )


_register(QuerySpec(
    name="f_strings",
    survey="F1,F2,F3,F6",
    build=q_f_strings,
    oracle="""
        SELECT c_custkey,
               'AUTO-' || CAST(c_custkey AS VARCHAR) AS user_id,
               lower(trim(c_name)) AS name_lower,
               upper(c_mktsegment) AS segment_upper,
               regexp_replace(c_name, '[^0-9]', '', 'g') AS name_digits,
               CAST(length(c_name) AS INT) AS name_len,
               c_mktsegment || ' ' || c_name AS trade_desc
        FROM customer
    """,
    tags=("scalar",),
))


def q_f_case_ladders(spark: SparkSession, sf: str) -> DataFrame:
    """F5/F7: ILIKE substring classify + multi-branch CASE segment ladder
    (sql/customer_360_views.sql:290-304, 473-482).
    """
    c = _t(spark, sf, "customer")
    p = _t(spark, sf, "part")
    segments = c.select(
        "c_custkey",
        case_ladder(
            [
                (F.col("c_acctbal") >= 8000, "VIP"),
                (F.col("c_acctbal") >= 5000, "Loyal"),
                (F.col("c_acctbal") >= 1000, "Active"),
                (F.col("c_acctbal") >= 0, "New"),
            ],
            default="Delinquent",
        ).alias("segment"),
    ).groupBy("segment").agg(F.count(F.lit(1)).alias("n_customers"))
    part_classes = p.select(
        ilike_classify(
            "p_type",
            [("polished", "Polished"), ("brushed", "Brushed"), ("anodized", "Anodized")],
            default="Other",
        ).alias("finish")
    ).groupBy("finish").agg(F.count(F.lit(1)).alias("n_customers"))
    return segments.withColumn("kind", F.lit("segment")).unionByName(
        part_classes.withColumnRenamed("finish", "segment").withColumn("kind", F.lit("finish"))
    )


_register(QuerySpec(
    name="f_case_ladders",
    survey="F5,F7",
    build=q_f_case_ladders,
    oracle="""
        SELECT CASE WHEN c_acctbal >= 8000 THEN 'VIP'
                    WHEN c_acctbal >= 5000 THEN 'Loyal'
                    WHEN c_acctbal >= 1000 THEN 'Active'
                    WHEN c_acctbal >= 0 THEN 'New'
                    ELSE 'Delinquent' END AS segment,
               COUNT(*) AS n_customers, 'segment' AS kind
        FROM customer GROUP BY 1
        UNION ALL
        SELECT CASE WHEN lower(p_type) LIKE '%polished%' THEN 'Polished'
                    WHEN lower(p_type) LIKE '%brushed%' THEN 'Brushed'
                    WHEN lower(p_type) LIKE '%anodized%' THEN 'Anodized'
                    ELSE 'Other' END AS segment,
               COUNT(*) AS n_customers, 'finish' AS kind
        FROM part GROUP BY 1
    """,
    tags=("scalar", "case"),
))


def q_f_dates(spark: SparkSession, sf: str) -> DataFrame:
    """F10-F14: calendar-year diffs, date-minus-date day counts, recency
    windows against a pinned as-of date (hard spot #4), DATE() casts.
    """
    o = _t(spark, sf, "orders")
    as_of = F.to_date(F.lit(AS_OF))
    return o.select(
        "o_orderkey",
        (F.year(as_of) - F.year("o_orderdate")).cast("int").alias("years_ago"),
        F.datediff(as_of, F.to_date("o_orderdate")).cast("int").alias("days_since"),
        recency_bucket(
            F.to_date("o_orderdate"), as_of,
            [(90, "Hot"), (365, "Recent"), (1095, "Aging")],
            default="Inactive",
        ).alias("recency"),
        (F.to_date("o_orderdate") >= F.date_sub(as_of, 180)).alias("last_180d"),
    )


_register(QuerySpec(
    name="f_dates",
    survey="F10,F11,F12,F13,F14",
    build=q_f_dates,
    oracle=f"""
        SELECT o_orderkey,
               CAST(EXTRACT(year FROM DATE '{AS_OF}') - EXTRACT(year FROM o_orderdate) AS INT)
                 AS years_ago,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') AS INT)
                 AS days_since,
               CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') <= 90 THEN 'Hot'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') <= 365 THEN 'Recent'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF}') <= 1095 THEN 'Aging'
                    ELSE 'Inactive' END AS recency,
               CAST(o_orderdate AS DATE) >= DATE '{AS_OF}' - INTERVAL 180 DAY AS last_180d
        FROM orders
    """,
    tags=("scalar", "dates"),
))


def q_f_guards(spark: SparkSession, sf: str) -> DataFrame:
    """F8/F9/F15/F16/F17: COALESCE defaults, NULLIF div-guard, ROUND,
    decimal arithmetic, boolean negation (can_market pattern,
    sql/customer_360_views.sql:725-737).
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    # rev accumulates integer cents (see _dec_sum): the coalesce/addition
    # guards then run on exact longs and the /100.0 emits the same
    # correctly-rounded double the DECIMAL formulation would.
    rev = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("rev_c"),
        F.count(F.lit(1)).alias("n"),
    )
    # per-customer revenue scales with the customer base — pin sort-merge
    j = c.join(rev.hint("merge"), c.c_custkey == rev.o_custkey, "left")
    return j.select(
        "c_custkey",
        (F.coalesce(F.col("rev_c"), F.lit(0)).cast("double") / 100.0)
        .alias("lifetime_value"),
        ((F.col("rev_c").cast("double") / 100.0)
         / F.nullif(F.col("n"), F.lit(0)).cast("double")).alias("avg_value"),
        (~F.coalesce(F.col("c_acctbal") < 0, F.lit(False))).alias("can_market"),
        ((F.coalesce(F.col("rev_c"), F.lit(0)) + _cents("c_acctbal"))
         .cast("double") / 100.0).alias("combined_value"),
    )


_register(QuerySpec(
    name="f_guards",
    survey="F8,F9,F15,F16,F17",
    build=q_f_guards,
    oracle="""
        WITH rev AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev, COUNT(*) AS n
          FROM orders GROUP BY 1
        )
        SELECT c.c_custkey,
               CAST(COALESCE(rev.rev, 0) AS DOUBLE) AS lifetime_value,
               CAST(rev.rev AS DOUBLE) / CAST(NULLIF(rev.n, 0) AS DOUBLE) AS avg_value,
               NOT COALESCE(c.c_acctbal < 0, FALSE) AS can_market,
               CAST(COALESCE(rev.rev, 0) + CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
                 AS combined_value
        FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey
    """,
    tags=("scalar",),
))


def q_f_hash_ids(spark: SparkSession, sf: str) -> DataFrame:
    """F18/F19/F1: md5 message-id minting with 50-char cap, AUTO- user ids,
    ISO8601 noon-pad formatting (lambda_redshift_to_segment.py:316-356).
    """
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        message_id(F.col("o_orderkey"), F.col("o_custkey"), prefix="vp_").alias("message_id"),
        mint_user_id("o_custkey").alias("user_id"),
        iso8601_noon("o_orderdate").alias("event_ts"),
    )


_register(QuerySpec(
    name="f_hash_ids",
    survey="F18,F19,F1,UD1,UD2",
    build=q_f_hash_ids,
    oracle="""
        SELECT o_orderkey,
               substr('vp_' || md5(CAST(o_orderkey AS VARCHAR) || '_' ||
                                   CAST(o_custkey AS VARCHAR)), 1, 50) AS message_id,
               'AUTO-' || CAST(o_custkey AS VARCHAR) AS user_id,
               strftime(o_orderdate, '%Y-%m-%dT12:00:00Z') AS event_ts
        FROM orders
    """,
    tags=("scalar", "hash"),
))


def q_f_url_params(spark: SparkSession, sf: str) -> DataFrame:
    """F22/F23: URL query-param extraction (UTM attribution,
    website-tracker.js:104-120) + regex capture groups.
    """
    ev = _t(spark, sf, "events")
    url = F.concat(
        F.lit("https://dealer.example/lp?utm_source="), F.col("event_type"),
        F.lit("&utm_campaign=c"), (F.col("user_id") % 5).cast("string"),
        F.lit("&gclid=g"), F.col("event_id").cast("string"),
    )
    with_url = ev.select("event_id", url.alias("url"))
    return with_url.select(
        "event_id",
        url_query_param("url", "utm_source").alias("utm_source"),
        url_query_param("url", "utm_campaign").alias("utm_campaign"),
        F.regexp_extract("url", r"gclid=(g[0-9]+)", 1).alias("gclid"),
    )


_register(QuerySpec(
    name="f_url_params",
    survey="F22,F23",
    build=q_f_url_params,
    oracle="""
        WITH u AS (
          SELECT event_id,
                 'https://dealer.example/lp?utm_source=' || event_type ||
                 '&utm_campaign=c' || CAST(user_id % 5 AS VARCHAR) ||
                 '&gclid=g' || CAST(event_id AS VARCHAR) AS url
          FROM events
        )
        SELECT event_id,
               regexp_extract(url, 'utm_source=([^&]+)', 1) AS utm_source,
               regexp_extract(url, 'utm_campaign=([^&]+)', 1) AS utm_campaign,
               regexp_extract(url, 'gclid=(g[0-9]+)', 1) AS gclid
        FROM u
    """,
    tags=("scalar", "url"),
))


