"""Projections / filters (SURVEY §2.2).

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



def q_p2_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """P2/P11: required-field quality gate + narrow projection.

    The projection+filter reach the parquet scan (PushedFilters / pruned
    ReadSchema) — at 100 TB this is the difference between reading 2 columns
    and reading 16.
    """
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(
            F.col("l_orderkey").isNotNull()
            & F.col("l_partkey").isNotNull()
            & (F.col("l_quantity") > 0)
            & (F.col("l_shipdate") >= F.lit("1998-01-01"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            _dec_sum("l_quantity", "sum_qty"),
        )
    )


_register(QuerySpec(
    name="p2_quality_filter",
    survey="P2,P11",
    build=q_p2_quality_filter,
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
          AND l_quantity > 0 AND l_shipdate >= TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag
    """,
    bench=True,
    tags=("filter", "scan"),
))


def q_p6_regex_validity(spark: SparkSession, sf: str) -> DataFrame:
    """P5/P6/F3/F4/F6: regex shape checks + digit extraction.

    Customer names carry an embedded number; treat it like the reference's
    phone-digit validation (strip non-digits, length check) and apply a
    case-insensitive regex like its email-shape test.
    """
    c = _t(spark, sf, "customer")
    digits = F.regexp_replace(F.col("c_name"), r"[^0-9]", "")
    return (
        c.withColumn("digits", digits)
        .filter(
            (F.length("digits") >= 5)
            & F.col("c_name").rlike(r"(?i)^customer#[0-9]+$")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_valid"),
            F.max(F.length("digits")).cast("long").alias("max_digits"),
        )
    )


_register(QuerySpec(
    name="p6_regex_validity",
    survey="P5,P6,F3,F4,F6",
    build=q_p6_regex_validity,
    oracle="""
        WITH d AS (
          SELECT c_mktsegment, regexp_replace(c_name, '[^0-9]', '', 'g') AS digits
          FROM customer
          WHERE regexp_matches(c_name, '(?i)^customer#[0-9]+$')
        )
        SELECT c_mktsegment, COUNT(*) AS n_valid,
               CAST(MAX(length(digits)) AS BIGINT) AS max_digits
        FROM d WHERE length(digits) >= 5
        GROUP BY c_mktsegment
    """,
    tags=("filter", "regex"),
))


def q_p8_anti_join_processed(spark: SparkSession, sf: str) -> DataFrame:
    """P8: NOT-IN-huge-list rewritten as left_anti join.

    The reference inlines every processed id into SQL text
    (lambda_redshift_to_segment.py:159-163) — unbounded at scale. The
    anti-join shuffles only the key column and survives any state size.
    """
    orders = _t(spark, sf, "orders")
    processed = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    # the processed set is ~half the table — never broadcastable at 100 TB;
    # the merge hint keeps the toy-scale plan the same sort-merge anti the
    # real cluster would run (and hash_prefilter_join is the scale path
    # when the processed set is selective — see scale_bloom_prune)
    fresh = orders.join(processed.hint("merge"), "o_orderkey", "left_anti")
    return fresh.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_fresh"),
        _dec_sum("o_totalprice", "sum_price"),
    )


_register(QuerySpec(
    name="p8_anti_join_processed",
    survey="P8",
    build=q_p8_anti_join_processed,
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_fresh,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders o
        WHERE NOT EXISTS (
          SELECT 1 FROM orders p
          WHERE p.o_orderstatus = 'F' AND p.o_orderkey = o.o_orderkey)
        GROUP BY o_orderpriority
    """,
    bench=True,
    tags=("anti_join",),
))


def q_p9_date_range(spark: SparkSession, sf: str) -> DataFrame:
    """P9: between-dates predicate (partition-prunable at the lake layer)."""
    orders = _t(spark, sf, "orders")
    return (
        orders.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31"))
        .groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_register(QuerySpec(
    name="p9_date_range",
    survey="P9",
    build=q_p9_date_range,
    oracle="""
        SELECT CAST(o_orderdate AS DATE) AS order_day, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        GROUP BY 1
    """,
    tags=("filter",),
))


def q_p10_json_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """P10/F21: JSON field extraction + null/format normalizers."""
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(
            "event_type",
            k.alias("k"),
            F.nullif(F.trim(F.col("event_type")), F.lit("")).alias("cleaned_type"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.count(F.when(F.col("cleaned_type").isNull(), 1)).alias("n_blank"),
        )
    )


_register(QuerySpec(
    name="p10_json_normalize",
    survey="P10,F21",
    build=q_p10_json_normalize,
    oracle="""
        SELECT event_type,
               COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               COUNT(CASE WHEN nullif(trim(event_type), '') IS NULL THEN 1 END) AS n_blank
        FROM events
        GROUP BY event_type
    """,
    tags=("json",),
))


def q_p_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over free text — the training-corpus scrub pass. The
    documents fixture is lowercase-words-only, so a PII-bearing column is
    synthesized deterministically in-query (emails with case/whitespace
    noise for 1-in-3 docs, punctuated phones for 1-in-4) and then redacted
    with the reference's email/phone shapes (sql/customer_360_views.sql:
    93-107) generalized to scan form. Pure regexp_replace/extract_all —
    whole-stage codegen, zero shuffles before the scan output.
    """
    docs = _t(spark, sf, "documents")
    did = F.col("doc_id").cast("string")
    pii_text = F.concat(
        F.substring("text", 1, 40),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" reach me at User"), did, F.lit("@Example.COM now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" call (555) 010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       pii_text.alias("pii_text"))
    return base.select(
        "doc_id",
        count_emails("pii_text").cast("int").alias("n_emails"),
        count_phones("pii_text").cast("int").alias("n_phones"),
        redact_pii("pii_text").alias("redacted"),
    )


_register(QuerySpec(
    name="p_pii_redaction",
    survey="north-star: PII redaction / text normalization (P5/P6 regex family)",
    build=q_p_pii_redaction,
    oracle="""
        WITH base AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 substr(text, 1, 40)
                 || (CASE WHEN doc_id % 3 = 0
                          THEN ' reach me at User' || CAST(doc_id AS VARCHAR)
                               || '@Example.COM now' ELSE '' END)
                 || (CASE WHEN doc_id % 4 = 0
                          THEN ' call (555) 010-'
                               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                          ELSE '' END) AS pii_text
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(pii_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
                 AS n_emails,
               CAST(len(regexp_extract_all(regexp_replace(pii_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '', 'g'),
                 '\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}')) AS INT)
                 AS n_phones,
               regexp_replace(regexp_replace(pii_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '[EMAIL]', 'g'),
                 '\\(?[0-9]{3}\\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}',
                 '[PHONE]', 'g') AS redacted
        FROM base
    """,
    tags=("pii", "text"),
))


