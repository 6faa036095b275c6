"""Operator catalog: one entry per SURVEY.md §2 operator (+ extensions).

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the equivalent
ANSI SQL the DuckDB oracle runs over the same parquet tables (TESTDATA.md:
region nation customer supplier part orders lineitem events documents
embeddings). The driver hash-compares results, so every computed column is
aliased identically on both sides.

Determinism rules (SURVEY hard spot #4 + oracle hashing):
- no wall clock: fixed as-of dates (AS_OF for the TPC-H-ish tables,
  EVENTS_AS_OF for events);
- money aggregates go through DECIMAL(18,2) (exact, engine-independent) and
  are cast to double only at the end — both engines then emit bit-identical
  float64;
- every window/top-k has a total order (unique tiebreaker columns);
- array outputs are rendered to strings with an explicit element order.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators import (
    case_ladder,
    dedup_latest,
    dedup_latest_agg,
    ilike_classify,
    ordered_distinct_array,
    primary_relationship,
    sequence_number,
)
from automotive_data_pipeline_demo_spark.operators.classify import recency_bucket
from automotive_data_pipeline_demo_spark.operators.cleaning import (
    count_emails,
    count_phones,
    redact_pii,
)
from automotive_data_pipeline_demo_spark.operators.quality import dq_report
from automotive_data_pipeline_demo_spark.operators.asof import asof_join, range_join
from automotive_data_pipeline_demo_spark.operators.scale import (
    bucketed_join,
    global_sequence,
    hash_prefilter_join,
    salted_groupby_sum,
    skew_report,
    write_bucketed,
    write_range_sorted,
)
from automotive_data_pipeline_demo_spark.functions.scalars import (
    iso8601_noon,
    message_id,
    mint_user_id,
    url_query_param,
)
from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
    build_band_index,
    connected_components,
    dedup_cluster_stats,
    dedup_corpus,
    dedup_corpus_best,
    duplicated_ngram_fraction,
    exact_dedup,
    minhash_candidate_pairs,
    minhash_jaccard_estimate,
    near_dup_against_index,
    near_dup_dedup,
    ngram_contamination,
    ngram_jaccard_pairs,
    scrub_shared_spans,
    shingle_arrays,
    simhash,
    simhash_dedup,
    simhash_near_pairs,
    word_shingles,
)
from automotive_data_pipeline_demo_spark.extensions.classifier import (
    hashed_linear_score,
)
from automotive_data_pipeline_demo_spark.extensions.multimodal import (
    frame_sample_plan,
    image_dimensions,
)
from automotive_data_pipeline_demo_spark.extensions.quantization import (
    quantized_rerank_topk,
    quantized_topk,
)
from automotive_data_pipeline_demo_spark.operators.layout import (
    morton_code,
    morton_sql,
    write_zorder,
)
from automotive_data_pipeline_demo_spark.extensions.similarity import (
    brute_force_topk,
    embedding_dim_stats,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans_lloyd,
    lsh_bucketed_topk,
)
from automotive_data_pipeline_demo_spark.functions.adf import parsed_lead
from automotive_data_pipeline_demo_spark.functions.scalars import track_event_struct
from automotive_data_pipeline_demo_spark.plans.etl import sql_over_frames
from automotive_data_pipeline_demo_spark.streaming.identity import (
    resolve_identities_batch,
)
from automotive_data_pipeline_demo_spark.streaming.sessions import (
    match_analytics_breakdown,
    sessionize_capped,
)
from automotive_data_pipeline_demo_spark.sources.inbox import (
    read_latest_encrypted_inbox,
    xor_decryptor,
)
from automotive_data_pipeline_demo_spark.sources.readers import (
    read_csv_typed,
    read_jsonl_typed,
    read_lake,
    read_lake_evolved,
    write_partitioned_lake,
)
from automotive_data_pipeline_demo_spark.sources.merge import scd2_merge
from automotive_data_pipeline_demo_spark.sources.sinks import write_jsonl_events
from automotive_data_pipeline_demo_spark.extensions.sampling import (
    hash_split,
    interleave_sources,
    mixture_resample,
    temperature_mixture,
    top_fraction_per_group,
    pack_sequences,
    shard_manifest,
    stratified_sample,
    uniform_sample_k,
)
from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
    bind_once,
    bm25_topk,
    ccnet_bands,
    corpus_snapshot_diff,
    doc_fingerprint,
    source_drift_report,
    language_id,
    ngram_repetition,
    quality_score,
    lm_cross_entropy,
    nfc_normalize_text,
    rolling_fingerprint,
    tfidf_top_terms,
    unigram_entropy,
    token_count_bpe,
    chunk_tokens,
    token_count_ws,
    tokenize,
    tokenize_to_ids,
    vocab_oov_rate,
)

AS_OF = "1998-12-01"          # orders/lineitem span 1995..2001
EVENTS_AS_OF = "2024-02-01"   # events span 2024-01


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The caller may hand us any session (the driver builds its own); pin the
    # runtime-settable confs the catalog's semantics depend on. Spark 4
    # defaults ANSI on; the reference's contract is permissive casts
    # (bad string -> NULL, glue ApplyMapping behavior), and the DuckDB
    # oracle compares naive-UTC timestamps.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet has shipped as TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects — read nanos as long, convert) and as
        # plain micros (read as TIMESTAMP_NTZ). Normalize both to
        # TimestampType in the UTC session so downstream semantics and the
        # DuckDB oracle's naive-UTC comparison are identical either way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType.simpleString()
        if ts_type == "bigint":  # nanos surfaced as long
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        if ts_type != "timestamp":
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cents(col) -> "F.Column":
    """Money as integer cents (exact for 2-dp values stored as doubles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def _dec_sum(col, alias: str):
    """Exact money sum: accumulate integer CENTS in a JVM long, divide once
    at the end. Bit-identical to SUM(CAST(x AS DECIMAL(18,2)))::DOUBLE —
    both emit the correctly-rounded double of the same exact rational — but
    ~20x faster at scale: Spark's decimal aggregate runs on boxed
    BigDecimal outside the vectorized path (sf1 bench: 23.5s -> 1.2s for
    join+sum over 6M rows), while a long sum stays in whole-stage codegen.
    Long capacity is ample: 9.2e18 cents = $92 quadrillion.
    """
    return (F.sum(_cents(col)).cast("double") / 100.0).alias(alias)


@dataclass
class QuerySpec:
    name: str
    survey: str                      # SURVEY §2 ids this covers
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None        # DuckDB SQL; None -> rows-only check
    bench: bool = False              # include in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


CATALOG: list[QuerySpec] = []


def _register(spec: QuerySpec) -> QuerySpec:
    CATALOG.append(spec)
    return spec


# --------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# Joins + aggregation (SURVEY §2.3 / §2.4)
# --------------------------------------------------------------------------

def q_j1_a1_customer_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """J1+A1+A2: left join profiles x history, per-customer hash aggregate
    with conditional counts — the customer_segments core
    (sql/customer_360_views.sql:396-425).

    customer is the small side only in toy data; at 100 TB both sides are
    big and this is a plain shuffled hash-agg after a sort-merge join on the
    high-cardinality key — no broadcast, partial aggregation map-side.
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    # Partial aggregation BELOW the join (a rewrite Catalyst does not do):
    # orders collapse to per-customer grain first, so the sort-merge join
    # moves one row per customer instead of one per order — a ~10x cut in
    # join input at any scale. Equivalent because the final grain
    # (c_custkey, c_name, c_mktsegment) is keyed by the customer PK; the
    # orderless-customer semantics (counts 0, sums/dates NULL) are restored
    # by the coalesces below, matching the LEFT JOIN + GROUP BY oracle.
    per_cust = o.groupBy("o_custkey").agg(
        F.count("o_orderkey").alias("__n"),
        F.sum(_cents("o_totalprice")).alias("__rev_c"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.min(F.to_date("o_orderdate")).alias("first_order_date"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("__fin"),
        F.count(F.when(F.col("o_orderpriority").startswith("1"), 1)).alias("__urg"),
    )
    joined = c.join(
        per_cust.hint("merge"), c.c_custkey == per_cust.o_custkey, "left"
    )
    return joined.select(
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.coalesce("__n", F.lit(0)).alias("total_orders"),
        (F.col("__rev_c").cast("double") / 100.0).alias("lifetime_value"),
        ((F.col("__rev_c").cast("double") / 100.0) / F.col("__n"))
        .alias("avg_order_value"),
        "last_order_date",
        "first_order_date",
        F.coalesce("__fin", F.lit(0)).alias("finished_orders"),
        F.coalesce("__urg", F.lit(0)).alias("urgent_orders"),
    )


_register(QuerySpec(
    name="j1_a1_customer_metrics",
    survey="J1,J8,A1,A2,A10",
    build=q_j1_a1_customer_metrics,
    oracle="""
        SELECT c.c_custkey, c.c_name, c.c_mktsegment,
               COUNT(o.o_orderkey) AS total_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(o.o_orderkey) AS avg_order_value,
               MAX(CAST(o.o_orderdate AS DATE)) AS last_order_date,
               MIN(CAST(o.o_orderdate AS DATE)) AS first_order_date,
               COUNT(CASE WHEN o.o_orderstatus = 'F' THEN 1 END) AS finished_orders,
               COUNT(CASE WHEN o.o_orderpriority LIKE '1%' THEN 1 END) AS urgent_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2, 3
    """,
    bench=True,
    tags=("join", "agg"),
))


def q_j2_w4_primary_priority(spark: SparkSession, sf: str) -> DataFrame:
    """A4+W4+J2: per-customer "primary" order priority (most orders, then
    most recent), inner-joined back to the profile — the primary-dealership
    pattern (sql/customer_360_views.sql:528-608).
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    primary = primary_relationship(
        o, "o_custkey", "o_orderpriority",
        order_agg={"last_order": F.max(F.to_date("o_orderdate"))},
    )
    # primary-relationship rows are one per customer — both sides scale, so
    # sort-merge; primary is already hash-partitioned on the key from its
    # agg/window repartition, so only the profile side pays a new exchange
    return (
        c.join(primary.hint("merge"), c.c_custkey == primary.o_custkey, "inner")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("o_orderpriority").alias("primary_priority"),
            F.col("transaction_count").alias("transaction_count"),
            F.col("last_order").alias("last_transaction_date"),
        )
    )


_register(QuerySpec(
    name="j2_w4_primary_priority",
    survey="J2,A4,W4",
    build=q_j2_w4_primary_priority,
    oracle="""
        WITH g AS (
          SELECT o_custkey, o_orderpriority,
                 COUNT(*) AS transaction_count,
                 MAX(CAST(o_orderdate AS DATE)) AS last_order
          FROM orders GROUP BY 1, 2
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY transaction_count DESC, last_order DESC,
                            o_orderpriority ASC) AS rk
          FROM g
        )
        SELECT c.c_custkey, c.c_mktsegment,
               r.o_orderpriority AS primary_priority,
               r.transaction_count AS transaction_count,
               r.last_order AS last_transaction_date
        FROM customer c JOIN ranked r ON c.c_custkey = r.o_custkey
        WHERE r.rk = 1
    """,
    bench=True,
    tags=("window", "join"),
))


def q_j3_validation_join(spark: SparkSession, sf: str) -> DataFrame:
    """J3+P7: inner join as validation — only rows whose parent passes the
    compliance filter survive; output is fact columns only
    (sql/customer_360_views.sql:628-635).
    """
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    valid_orders = o.filter(
        (F.col("o_orderstatus") != "F") & (F.col("o_totalprice") > 1000)
    ).select("o_orderkey")
    # Existence filter, not enrichment: semi join keeps exactly the fact
    # rows with a valid parent (o_orderkey is the orders PK, so this equals
    # the oracle's inner join). The filter passes most orders, so at 100 TB
    # this side never broadcasts; shuffle_hash (not merge) pins the
    # partitioned-hash shape — a semi join needs no sort on either side,
    # and the build side is the orders PK slice (one long per row), whose
    # per-partition hash table stays small at any scale because partition
    # count grows with the data. ~20% over sort-merge at sf1.
    validated = li.join(
        valid_orders.hint("shuffle_hash"),
        li.l_orderkey == valid_orders.o_orderkey,
        "left_semi",
    )
    return validated.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        _dec_sum("l_extendedprice", "sum_price"),
    )


_register(QuerySpec(
    name="j3_validation_join",
    survey="J3,P7",
    build=q_j3_validation_join,
    oracle="""
        SELECT l.l_linestatus, COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus <> 'F' AND o.o_totalprice > 1000
        GROUP BY 1
    """,
    bench=True,
    tags=("join",),
))


def q_j4_session_bridge(spark: SparkSession, sf: str) -> DataFrame:
    """J4/J5: session-bridge join — signup events matched to the same user's
    purchase events within the next 24 h (equi + range hybrid, the identity
    join at identity-resolution/api-server.js:249-251).

    Equi key first (user_id) so the range predicate evaluates inside the
    hash-join match, never as a cross product.
    """
    ev = _t(spark, sf, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    # both sides are type-filtered slices of the event stream — they scale
    # with the data and never broadcast at 100 TB; pin sort-merge so the
    # local plan is the one the cluster would run
    joined = signups.join(
        purchases.hint("merge"),
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 24 HOURS")),
        "inner",
    )
    return joined.groupBy("s_user").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        _dec_sum("p_value", "conversion_value"),
        F.min("p_ts").alias("first_conversion_ts"),
    )


_register(QuerySpec(
    name="j4_session_bridge",
    survey="J4,J5,ST4",
    build=q_j4_session_bridge,
    oracle="""
        SELECT s.user_id AS s_user, COUNT(*) AS n_conversions,
               CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS conversion_value,
               MIN(p.ts) AS first_conversion_ts
        FROM events s
        JOIN events p ON s.user_id = p.user_id
                     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
        WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
        GROUP BY 1
    """,
    bench=True,
    tags=("join", "range"),
))


def q_j5_identity_two_tier(spark: SparkSession, sf: str) -> DataFrame:
    """J5/ST4/ST9 headline: the reference's TWO-TIER identity resolution
    (identity-resolution/api-server.js:247-260) — session-id match first,
    normalized email/phone fallback ONLY for leads tier 1 missed, unmatched
    leads retained with is_matched=false (database-schema.sql:344-357).

    Visitors/leads are synthesized deterministically from events (views ->
    visitor sessions, signups -> CRM leads) with contact noise (case,
    whitespace, phone punctuation) that clean_email/clean_phone must
    normalize for tier 2 to hit. Every tier is an equi-join (session id;
    lower(email); digits(phone)) with the ±24 h window evaluated inside the
    join and the email-OR-phone predicate split into two equi-joins united
    afterwards — an OR of equalities would plan as a CartesianProduct.
    """
    ev = _t(spark, sf, "events")
    uid = F.col("user_id").cast("string")
    visitors = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("visitor_id"),
        F.when(F.col("event_id") % 2 == 0, F.concat(F.lit("S"), uid))
        .alias("session_id"),
        F.when(
            F.col("user_id") % 3 == 0,
            F.concat(F.lit(" User"), uid, F.lit("@Example.COM ")),
        ).alias("email"),
        F.when(
            F.col("user_id") % 5 == 0,
            F.concat(F.lit("(555) 01-"), uid),
        ).alias("phone"),
        F.col("ts").alias("first_seen"),
    )
    leads = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("lead_id"),
        F.when(F.col("event_id") % 3 == 0, F.concat(F.lit("S"), uid))
        .alias("session_id"),
        F.when(
            F.col("user_id") % 2 == 0,
            F.concat(F.lit("user"), uid, F.lit("@example.com")),
        ).alias("email"),
        F.when(
            F.col("user_id") % 7 == 0,
            F.concat(F.lit("555-01-"), uid),
        ).alias("phone"),
        F.col("ts").alias("lead_submitted_at"),
    )
    return resolve_identities_batch(visitors, leads)


_register(QuerySpec(
    name="j5_identity_two_tier",
    survey="J5,ST4,ST9: two-tier identity resolution (session, then contact)",
    build=q_j5_identity_two_tier,
    oracle="""
        WITH v AS (
          SELECT event_id AS visitor_id,
                 CASE WHEN event_id % 2 = 0
                      THEN 'S' || CAST(user_id AS VARCHAR) END AS v_session,
                 CASE WHEN user_id % 3 = 0
                      THEN lower(trim(' User' || CAST(user_id AS VARCHAR)
                                      || '@Example.COM ')) END AS v_email,
                 CASE WHEN user_id % 5 = 0
                      THEN nullif(regexp_replace('(555) 01-'
                             || CAST(user_id AS VARCHAR), '[^0-9]', '', 'g'),
                           '') END AS v_phone,
                 ts AS first_seen
          FROM events WHERE event_type = 'view'
        ), l AS (
          SELECT event_id AS lead_id,
                 CASE WHEN event_id % 3 = 0
                      THEN 'S' || CAST(user_id AS VARCHAR) END AS l_session,
                 CASE WHEN user_id % 2 = 0
                      THEN lower(trim('user' || CAST(user_id AS VARCHAR)
                                      || '@example.com')) END AS l_email,
                 CASE WHEN user_id % 7 = 0
                      THEN nullif(regexp_replace('555-01-'
                             || CAST(user_id AS VARCHAR), '[^0-9]', '', 'g'),
                           '') END AS l_phone,
                 ts AS lead_submitted_at
          FROM events WHERE event_type = 'signup'
        ), t1 AS (
          SELECT l.lead_id, v.visitor_id, l.lead_submitted_at,
                 ROW_NUMBER() OVER (PARTITION BY l.lead_id ORDER BY
                   abs(epoch_us(l.lead_submitted_at) - epoch_us(v.first_seen)),
                   v.visitor_id) AS rn
          FROM l JOIN v ON l.l_session = v.v_session
           AND epoch_us(l.lead_submitted_at) - epoch_us(v.first_seen)
               BETWEEN -86400000000 AND 86400000000
        ), t1b AS (
          SELECT lead_id, visitor_id, 'session_id' AS match_method
          FROM t1 WHERE rn = 1
        ), t2cand AS (
          SELECT l.lead_id, v.visitor_id, l.lead_submitted_at, v.first_seen
          FROM l JOIN v ON l.l_email = v.v_email
           AND abs(epoch_us(l.lead_submitted_at) - epoch_us(v.first_seen))
               <= 86400000000
          WHERE l.lead_id NOT IN (SELECT lead_id FROM t1b)
          UNION ALL
          SELECT l.lead_id, v.visitor_id, l.lead_submitted_at, v.first_seen
          FROM l JOIN v ON l.l_phone = v.v_phone
           AND abs(epoch_us(l.lead_submitted_at) - epoch_us(v.first_seen))
               <= 86400000000
          WHERE l.lead_id NOT IN (SELECT lead_id FROM t1b)
        ), t2 AS (
          SELECT lead_id, visitor_id,
                 ROW_NUMBER() OVER (PARTITION BY lead_id ORDER BY
                   abs(epoch_us(lead_submitted_at) - epoch_us(first_seen)),
                   visitor_id) AS rn
          FROM t2cand
        ), t2b AS (
          SELECT lead_id, visitor_id, 'email_phone' AS match_method
          FROM t2 WHERE rn = 1
        ), m AS (
          SELECT * FROM t1b UNION ALL SELECT * FROM t2b
        )
        SELECT l.lead_id, m.visitor_id, m.match_method,
               m.match_method IS NOT NULL AS is_matched,
               CASE WHEN m.match_method IS NOT NULL
                    THEN l.lead_submitted_at END AS matched_at
        FROM l LEFT JOIN m ON l.lead_id = m.lead_id
    """,
    tags=("identity", "join", "two_tier"),
))


def q_j6_a8_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """J6+A5+A6+A8: attribution funnel — sessions left-joined to matches,
    grouped by source, with FILTER-style conditional aggregates and a
    guarded match-rate ratio (identity-resolution/database-schema.sql:306-342).
    """
    ev = _t(spark, sf, "events")
    visitors = ev.filter(F.col("event_type").isin("view", "click"))
    buyers = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user")
    ).distinct()
    # distinct purchasers scale with the user base — never broadcastable at
    # 100 TB; pin sort-merge so the local plan matches the cluster plan
    joined = visitors.join(
        buyers.hint("merge"), visitors.user_id == buyers.b_user, "left"
    )
    return joined.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_visitors"),
        F.countDistinct("b_user").alias("n_matched"),
        F.round(
            F.countDistinct("b_user") * 100.0
            / F.nullif(F.countDistinct("user_id"), F.lit(0)),
            2,
        ).alias("match_rate_pct"),
    )


_register(QuerySpec(
    name="j6_a8_attribution",
    survey="J6,A5,A6,A8,F9,F15",
    build=q_j6_a8_attribution,
    oracle="""
        WITH buyers AS (
          SELECT DISTINCT user_id AS b_user FROM events WHERE event_type = 'purchase'
        )
        SELECT e.event_type,
               COUNT(DISTINCT e.user_id) AS n_visitors,
               COUNT(DISTINCT b.b_user) AS n_matched,
               ROUND(COUNT(DISTINCT b.b_user) * 100.0
                     / NULLIF(COUNT(DISTINCT e.user_id), 0), 2) AS match_rate_pct
        FROM events e LEFT JOIN buyers b ON e.user_id = b.b_user
        WHERE e.event_type IN ('view', 'click')
        GROUP BY 1
    """,
    tags=("join", "agg"),
))


def q_j_full_outer_reconcile(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER reconciliation of two activity systems (the join type
    the reference never needed but a warehouse audit does): per-user
    order-side vs event-side aggregates, COALESCEd to zero, with a
    presence category (both / orders_only / events_only). Both sides
    reduce to user grain BEFORE the join, so the full-outer exchange
    carries two already-aggregated frames.
    """
    o = _t(spark, sf, "orders").groupBy(
        F.col("o_custkey").alias("user_id")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    e = _t(spark, sf, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    j = o.join(e, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.when(F.col("n_orders").isNotNull() & F.col("n_events").isNotNull(),
               "both")
        .when(F.col("n_orders").isNotNull(), "orders_only")
        .otherwise("events_only")
        .alias("presence"),
    )


_register(QuerySpec(
    name="j_full_outer_reconcile",
    survey="beyond-reference: FULL OUTER system reconciliation",
    build=q_j_full_outer_reconcile,
    oracle="""
        WITH o AS (
          SELECT o_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        ), e AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1
        )
        SELECT COALESCE(o.user_id, e.user_id) AS user_id,
               COALESCE(o.n_orders, 0) AS n_orders,
               COALESCE(e.n_events, 0) AS n_events,
               CASE WHEN o.user_id IS NOT NULL AND e.user_id IS NOT NULL
                    THEN 'both'
                    WHEN o.user_id IS NOT NULL THEN 'orders_only'
                    ELSE 'events_only' END AS presence
        FROM o FULL OUTER JOIN e ON o.user_id = e.user_id
    """,
    tags=("join", "reconcile"),
))


def q_j_fuzzy_blocking(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-resolution blocking join: candidate near-duplicate part names
    via block-then-score — the classic record-linkage recipe behind the
    reference's fuzzy contact fallback (J5,
    identity-resolution/api-server.js; there the block key is exact
    email/phone, here an attribute bucket). Pairs are generated ONLY inside
    a block (equi-join on p_size — a real shuffle key, never a cartesian),
    ordered a<b to emit each pair once, then scored with Levenshtein edit
    distance and thresholded; the survivors aggregate to candidate
    name-pairs with support counts.

    Scale shape: block cardinality bounds the fan-out (pairs per block ~
    (n/b)^2, tunable by block key choice exactly like MinHash bands bound
    x_dedup_minhash); the edit distance runs only on in-block pairs, and
    the final aggregate partial-combines on the name pair. The block key
    is COMPOSITE (brand x size, ~1250 blocks) — size alone leaves 50
    blocks whose quadratic expansion grows 25x faster with the corpus
    (measured 36 s vs 2 s at sf1); composing attributes is exactly how
    blocking stays bounded at 100 TB (or swap in a phonetic key).
    """
    part = _t(spark, sf, "part")
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("block_b"),
        F.col("p_size").alias("block_s"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("block_b"),
        F.col("p_size").alias("block_s"),
    )
    pairs = (
        a.join(b, ["block_b", "block_s"])
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.col("name_a") != F.col("name_b"))
        # thresholded levenshtein abandons the DP once the distance is
        # provably > 3 (returns -1) — on long strings the early exit cuts
        # the per-pair cost from O(len^2) to O(len*threshold)
        .withColumn("lev", F.levenshtein("name_a", "name_b", 3))
        .filter(F.col("lev") >= 0)
    )
    return pairs.groupBy("name_a", "name_b", "lev").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


_register(QuerySpec(
    name="j_fuzzy_blocking",
    survey="J5 generalization: blocked fuzzy-match candidate generation",
    build=q_j_fuzzy_blocking,
    oracle="""
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_size = b.p_size
             AND a.p_partkey < b.p_partkey
             AND a.p_name <> b.p_name
             AND levenshtein(a.p_name, b.p_name) <= 3
        GROUP BY 1, 2, 3
    """,
    tags=("join", "fuzzy", "blocking"),
))


def q_a3_ordered_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """A3: ordered-distinct array agg — DISTINCT priorities per customer
    ordered by most-recent order date (ARRAY_AGG(DISTINCT x ORDER BY d DESC),
    sql/customer_360_views.sql:407-408). Rendered as a joined string so both
    engines hash the same value.
    """
    o = _t(spark, sf, "orders")
    # ONE shuffle: ordered_distinct_array over raw rows keeps each value at
    # its max date (first occurrence after the sort), identical to the
    # per-value-max two-stage formulation but without the extra exchange.
    return o.groupBy("o_custkey").agg(
        F.array_join(
            ordered_distinct_array(
                F.col("o_orderpriority"), F.to_date("o_orderdate")
            ),
            ",",
        ).alias("priorities")
    )


_register(QuerySpec(
    name="a3_ordered_distinct",
    survey="A3,F25",
    build=q_a3_ordered_distinct,
    oracle="""
        WITH m AS (
          SELECT o_custkey, o_orderpriority AS v, MAX(CAST(o_orderdate AS DATE)) AS latest
          FROM orders GROUP BY 1, 2
        )
        SELECT o_custkey,
               string_agg(v, ',' ORDER BY latest DESC, v ASC) AS priorities
        FROM m GROUP BY o_custkey
    """,
    tags=("agg", "array"),
))


def q_a5_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    """A5: aggregate FILTER (WHERE ...) clause, Spark SQL >= 3.0."""
    ev = _t(spark, sf, "events")
    ev.createOrReplaceTempView("events_v")
    return spark.sql("""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
        FROM events_v GROUP BY user_id
    """)


_register(QuerySpec(
    name="a5_filter_clause",
    survey="A5",
    build=q_a5_filter_clause,
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
               CAST(SUM(CAST(value AS DECIMAL(18,2)))
                    FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS purchase_value
        FROM events GROUP BY user_id
    """,
    tags=("agg",),
))


def q_a7_having(spark: SparkSession, sf: str) -> DataFrame:
    """A7: group by derived expression + HAVING threshold
    (identity-resolution/database-schema.sql:337-342).
    """
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_day"))
        .agg(F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_users") >= 10)
    )


_register(QuerySpec(
    name="a7_having",
    survey="A7,F13",
    build=q_a7_having,
    oracle="""
        SELECT CAST(ts AS DATE) AS event_day,
               COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY 1 HAVING COUNT(DISTINCT user_id) >= 10
    """,
    tags=("agg",),
))


def q_a9_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """A9: two-grain rollup cache (daily + hourly) as ROLLUP(date, hour) —
    the match_analytics pattern (identity-resolution/database-schema.sql:196-229).
    """
    ev = _t(spark, sf, "events")
    return (
        ev.select(
            F.to_date("ts").alias("date_period"),
            F.hour("ts").alias("hour_period"),
            "value",
        )
        .rollup("date_period", "hour_period")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value", "total_value"),
        )
    )


_register(QuerySpec(
    name="a9_rollup",
    survey="A9",
    build=q_a9_rollup,
    oracle="""
        SELECT CAST(ts AS DATE) AS date_period,
               EXTRACT(hour FROM ts) AS hour_period,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY ROLLUP (1, 2)
    """,
    tags=("agg", "rollup"),
))


def q_a9_breakdown(spark: SparkSession, sf: str) -> DataFrame:
    """A9 breakdown maps: the match_analytics JSONB columns
    (utm_source_breakdown / match_method_breakdown,
    identity-resolution/database-schema.sql:211-213) — two-grain rollup
    where each (day[, hour]) cell carries an ordered per-method count map.
    Built from pre-aggregated (period, method) counts so exchanges carry
    aggregated rows only; the daily grain folds the hourly partials.
    """
    ev = _t(spark, sf, "events")
    return match_analytics_breakdown(ev, ts_col="ts", method_col="event_type")


_register(QuerySpec(
    name="a9_breakdown",
    survey="A9 (JSONB breakdown maps)",
    build=q_a9_breakdown,
    oracle="""
        WITH base AS (
          SELECT CAST(ts AS DATE) AS date_period,
                 CAST(EXTRACT(hour FROM ts) AS INT) AS hour_period,
                 event_type AS method, COUNT(*) AS cnt
          FROM events GROUP BY 1, 2, 3
        ), hourly AS (
          SELECT date_period, hour_period,
                 CAST(SUM(cnt) AS BIGINT) AS total_matches,
                 string_agg(method || ':' || CAST(cnt AS VARCHAR), ','
                            ORDER BY method) AS method_breakdown
          FROM base GROUP BY 1, 2
        ), db AS (
          SELECT date_period, method,
                 CAST(SUM(cnt) AS BIGINT) AS cnt
          FROM base GROUP BY 1, 2
        ), daily AS (
          SELECT date_period, CAST(NULL AS INT) AS hour_period,
                 CAST(SUM(cnt) AS BIGINT) AS total_matches,
                 string_agg(method || ':' || CAST(cnt AS VARCHAR), ','
                            ORDER BY method) AS method_breakdown
          FROM db GROUP BY 1
        )
        SELECT * FROM hourly UNION ALL SELECT * FROM daily
    """,
    tags=("agg", "rollup", "breakdown"),
))


# --------------------------------------------------------------------------
# Windows / sorts / set ops (SURVEY §2.5 / §2.6 / §2.7)
# --------------------------------------------------------------------------

def q_w1_dedup_latest(spark: SparkSession, sf: str) -> DataFrame:
    """W1/W2: the reference's signature operator — latest record per key via
    ROW_NUMBER (sql/customer_360_views.sql:71-74). Unique tiebreaker added:
    the reference's version is nondeterministic on ties.
    """
    li = _t(spark, sf, "lineitem")
    # the fixture has deliberate full-duplicate rows (FIXTURES.md): tiebreak
    # on every output column for a total order
    latest = dedup_latest(
        li, ["l_orderkey"], ["l_shipdate"], tiebreakers=["l_linenumber", "l_quantity"]
    )
    return latest.select(
        "l_orderkey", "l_linenumber",
        F.to_date("l_shipdate").alias("ship_day"),
        F.round(F.col("l_quantity").cast("decimal(18,2)"), 2).cast("double").alias("quantity"),
    )


_register(QuerySpec(
    name="w1_dedup_latest",
    survey="W1,W2,O4",
    build=q_w1_dedup_latest,
    oracle="""
        WITH r AS (
          SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_shipdate DESC, l_linenumber ASC,
                                             l_quantity ASC) AS rn
          FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity
        FROM r WHERE rn = 1
    """,
    bench=True,
    tags=("window",),
))


def q_w1_dedup_latest_agg(spark: SparkSession, sf: str) -> DataFrame:
    """W1 scale variant: the same latest-record-per-key result as
    w1_dedup_latest, computed as ONE partial-aggregating HashAggregate
    (per-column min_by over a packed-long rank — no sort anywhere in the
    plan, scan pruned to the 4 needed columns) instead of
    Exchange+Sort+Window. Shares w1's oracle so the driver proves both
    physical strategies
    produce identical rows; bench carries both so the sort-vs-agg gap is
    measured, not asserted (see dedup_latest_agg's docstring).
    """
    li = _t(spark, sf, "lineitem")
    # rank packed into ONE long (shipdate desc, then linenumber/quantity
    # asc) so every aggregation buffer is a fixed-width primitive and the
    # plan stays HashAggregate: (inverted day)«24 | linenumber«16 |
    # quantity-in-hundredths (l_linenumber<=7, l_quantity<=50 in this
    # corpus — widths chosen with headroom, asserted by the shared oracle)
    rank = (
        (F.lit(99999) - F.unix_date(F.to_date("l_shipdate"))).cast("long")
        * F.lit(1 << 24)
        + F.col("l_linenumber").cast("long") * F.lit(1 << 16)
        + F.round(F.col("l_quantity") * 100).cast("long")
    )
    latest = dedup_latest_agg(
        li, ["l_orderkey"], rank,
        payload=["l_linenumber", "l_shipdate", "l_quantity"],
    )
    return latest.select(
        "l_orderkey", "l_linenumber",
        F.to_date("l_shipdate").alias("ship_day"),
        F.round(F.col("l_quantity").cast("decimal(18,2)"), 2).cast("double").alias("quantity"),
    )


_register(QuerySpec(
    name="w1_dedup_latest_agg",
    survey="W1,W2,O4 (hash-agg physical strategy)",
    build=q_w1_dedup_latest_agg,
    oracle="""
        WITH r AS (
          SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
                 ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                    ORDER BY l_shipdate DESC, l_linenumber ASC,
                                             l_quantity ASC) AS rn
          FROM lineitem
        )
        SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
               CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS quantity
        FROM r WHERE rn = 1
    """,
    bench=True,
    tags=("window", "scale"),
))


def q_w3_sequence(spark: SparkSession, sf: str) -> DataFrame:
    """W3: per-key ascending sequence number (purchase sequence,
    sql/customer_360_views.sql:350-353).
    """
    o = _t(spark, sf, "orders")
    seq = sequence_number(
        o, ["o_custkey"], ["o_orderdate"], out_col="purchase_sequence",
        tiebreakers=["o_orderkey"],
    )
    return seq.select("o_custkey", "o_orderkey", "purchase_sequence")


_register(QuerySpec(
    name="w3_sequence",
    survey="W3",
    build=q_w3_sequence,
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate ASC, o_orderkey ASC)
                 AS purchase_sequence
        FROM orders
    """,
    tags=("window",),
))


def q_o2_topk(spark: SparkSession, sf: str) -> DataFrame:
    """O2: top-k pull — ORDER BY ... DESC LIMIT 1000
    (lambda_redshift_to_segment.py:207-208). Spark runs this as
    TakeOrderedAndProject (no global sort materialization).
    """
    o = _t(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(1000)
        .select("o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice").cast("decimal(18,2)"), 2)
                 .cast("double").alias("total_price"))
    )


_register(QuerySpec(
    name="o2_topk",
    survey="O2,O1",
    build=q_o2_topk,
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1000
    """,
    tags=("sort", "limit"),
))


def q_o3_nulls_last(spark: SparkSession, sf: str) -> DataFrame:
    """O3: ORDER BY ... DESC NULLS LAST over a genuinely nullable measure
    (identity-resolution/database-schema.sql:342).
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    rev = o.filter(F.col("o_orderstatus") == "O").groupBy("o_custkey").agg(
        _dec_sum("o_totalprice", "open_revenue")
    )
    # per-customer revenue scales with the customer base — sort-merge, not
    # the toy-scale broadcast the size estimate would pick
    joined = c.join(rev.hint("merge"), c.c_custkey == rev.o_custkey, "left")
    return (
        joined.orderBy(F.desc_nulls_last("open_revenue"), F.asc("c_custkey"))
        .limit(500)
        .select("c_custkey", "open_revenue")
    )


_register(QuerySpec(
    name="o3_nulls_last",
    survey="O3",
    build=q_o3_nulls_last,
    oracle="""
        WITH rev AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS open_revenue
          FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
        )
        SELECT c.c_custkey, rev.open_revenue
        FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey
        ORDER BY rev.open_revenue DESC NULLS LAST, c.c_custkey ASC LIMIT 500
    """,
    tags=("sort",),
))


def q_o_global_sequence(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global row numbering at scale: range-partition, count
    partitions (<= num_partitions longs to the driver), number locally
    with a cumulative offset — versus the naive ROW_NUMBER() OVER (ORDER
    BY ...) whose plan collapses the whole dataset into ONE partition
    (the exchange the single-partition plan guard bans). The oracle IS
    that naive global window, so the driver proves the distributed
    recipe numbers identically.
    """
    o = _t(spark, sf, "orders")
    return global_sequence(o.select("o_orderkey"), ["o_orderkey"], out_col="seq")


_register(QuerySpec(
    name="o_global_sequence",
    survey="O1 at scale: global sequence without a single-partition sort",
    build=q_o_global_sequence,
    oracle="""
        SELECT o_orderkey,
               CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS seq
        FROM orders
    """,
    tags=("sort", "scale"),
))


def q_u1_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """U1: SELECT DISTINCT (README.md:170-176)."""
    o = _t(spark, sf, "orders")
    return o.select("o_custkey", "o_orderpriority").distinct()


_register(QuerySpec(
    name="u1_distinct",
    survey="U1",
    build=q_u1_distinct,
    oracle="SELECT DISTINCT o_custkey, o_orderpriority FROM orders",
    tags=("distinct",),
))


def q_u2_merge_union(spark: SparkSession, sf: str) -> DataFrame:
    """U2+J7+S5: the MERGE upsert expressed relationally — target rows not
    matched by updates, UNION the updates (DELETE USING + INSERT SELECT,
    glue_vehicle_sales_etl.py:364-383). Updates here: finished orders get a
    re-delivered row with bumped price; idempotent by key.
    """
    o = _t(spark, sf, "orders")
    target = o.select("o_orderkey", "o_orderstatus",
                      F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    updates = (
        o.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.lit("R").alias("o_orderstatus"),
                (F.col("o_totalprice").cast("decimal(18,2)") + F.lit(1).cast("decimal(18,2)")).alias("price"))
    )
    kept = target.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = kept.unionByName(updates)
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price").cast("double").alias("sum_price"),
    )


_register(QuerySpec(
    name="u2_merge_union",
    survey="U2,J7,S5,ST1",
    build=q_u2_merge_union,
    oracle="""
        WITH target AS (
          SELECT o_orderkey, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders
        ), updates AS (
          SELECT o_orderkey, 'R' AS o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS price
          FROM orders WHERE o_orderstatus = 'F'
        ), merged AS (
          SELECT t.* FROM target t
          WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = t.o_orderkey)
          UNION ALL SELECT * FROM updates
        )
        SELECT o_orderstatus, COUNT(*) AS n_rows,
               CAST(SUM(price) AS DOUBLE) AS sum_price
        FROM merged GROUP BY 1
    """,
    tags=("merge", "union"),
))


def q_u3_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT/EXCEPT surface (free in Spark; SURVEY §2.7 note):
    customers active in 1995 and 1996 vs churned after 1995.
    """
    o = _t(spark, sf, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    both = y95.intersect(y96).withColumn("cohort", F.lit("retained"))
    churned = y95.subtract(y96).withColumn("cohort", F.lit("churned"))  # EXCEPT DISTINCT
    return both.unionByName(churned).groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_register(QuerySpec(
    name="u3_intersect_except",
    survey="U1 (extension: INTERSECT/EXCEPT)",
    build=q_u3_intersect_except,
    oracle="""
        WITH y95 AS (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
             y96 AS (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996),
             both_y AS (SELECT DISTINCT o_custkey FROM y95 INTERSECT SELECT DISTINCT o_custkey FROM y96),
             churned AS (SELECT DISTINCT o_custkey FROM y95 EXCEPT SELECT DISTINCT o_custkey FROM y96)
        SELECT 'retained' AS cohort, COUNT(*) AS n_customers FROM both_y
        UNION ALL
        SELECT 'churned' AS cohort, COUNT(*) AS n_customers FROM churned
    """,
    tags=("setop",),
))


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


# --------------------------------------------------------------------------
# Training-data extensions (BASELINE.json north star)
# --------------------------------------------------------------------------

_COS_SQL = """
    list_aggregate(list_transform(list_zip(
        list_transform({a}, x -> CAST(x AS DOUBLE)),
        list_transform({b}, x -> CAST(x AS DOUBLE))),
      p -> p[1] * p[2]), 'sum')
    / (sqrt(list_aggregate(list_transform({a},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
     * sqrt(list_aggregate(list_transform({b},
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))
"""


def q_x_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: content-digest groupBy; shuffle carries 32-byte hashes,
    not documents.
    """
    docs = _t(spark, sf, "documents")
    return exact_dedup(docs, "doc_id", "text").select(
        "content_hash", "keep_id", "n_dups"
    )


_register(QuerySpec(
    name="x_dedup_exact",
    survey="north-star: exact dedup",
    build=q_x_dedup_exact,
    oracle="""
        SELECT md5(text) AS content_hash,
               MIN(CAST(doc_id AS BIGINT)) AS keep_id,
               COUNT(*) AS n_dups
        FROM documents GROUP BY 1
    """,
    tags=("dedup",),
))


def q_x_dedup_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: salted-md5 min over word shingles,
    banded bucket equi-join (no O(n^2) pair space).
    """
    docs = _t(spark, sf, "documents")
    # max_bucket_size=None: exact mode, pinned to the declarative oracle
    return minhash_candidate_pairs(
        docs, "doc_id", "text", num_hashes=8, band_size=2, shingle_n=3,
        max_bucket_size=None,
    )


_register(QuerySpec(
    name="x_dedup_minhash",
    survey="north-star: minhash LSH dedup",
    build=q_x_dedup_minhash,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id,
                   array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx,
                 md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash
          FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        )
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
    """,
    tags=("dedup", "minhash"),
))


def q_x_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup dedup: docs >= 400 arrive as a new batch and are
    checked against the stored LSH band index of the existing corpus
    (doc_id < 400) — the daily-ingestion posture where the corpus is never
    re-shingled and its text is read only for band-hit candidates (a
    semi-join-pruned scan). Output: (new_id, dup_of, jaccard) — the batch
    rows to drop.
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    index = build_band_index(corpus, "doc_id", "text")
    # max_doc_freq=None pins exact-mode semantics to the declarative oracle
    # (the API default is the capped 100 TB-safe mode)
    return near_dup_against_index(
        batch, index, corpus, "doc_id", "text", threshold=0.3,
        max_doc_freq=None,
    )


_register(QuerySpec(
    name="x_dedup_incremental",
    survey="north-star: incremental dedup of a new batch vs a stored corpus index",
    build=q_x_dedup_incremental,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.id < 400 AND b.id >= 400
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        )
        SELECT i.id_b AS new_id, i.id_a AS dup_of,
               ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN sizes za ON za.id = i.id_a
        JOIN sizes zb ON zb.id = i.id_b
        WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.3
    """,
    tags=("dedup", "incremental"),
))


def q_x_text_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any exact 8-gram with
    the held-out eval set. The eval set is a FIXED-SIZE slice (doc_id <
    100) — real benchmarks don't grow with the corpus, and the broadcast
    gram set must stay constant-size at 100 TB (a fractional split like
    doc_id % 5 would broadcast 20% of the corpus). The corpus is scanned
    once, never shuffled — only sparse hits pay the pair aggregation.
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    bench = docs.filter(F.col("doc_id") < 100)
    out = ngram_contamination(corpus, bench, "doc_id", "text", n=8)
    return out.select(
        F.col("id").alias("doc_id"), "benchmark_id",
        F.col("n_shared").cast("long").alias("n_shared"),
    )


_register(QuerySpec(
    name="x_text_contamination",
    survey="north-star: benchmark decontamination (exact n-gram collision)",
    build=q_x_text_contamination,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT id, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), bench AS (SELECT * FROM grams WHERE id < 100),
           corp  AS (SELECT * FROM grams WHERE id >= 100)
        SELECT corp.id AS doc_id, bench.id AS benchmark_id,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM corp JOIN bench USING (g)
        GROUP BY 1, 2
    """,
    tags=("text", "decontamination"),
))


def q_x_text_overlap_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source leakage matrix: for every source pair, how many
    distinct 8-grams they share — the audit a curator runs before mixing
    corpora (one source quoting another inflates dedup losses and
    benchmark-contamination risk; decontamination's pairwise sibling).

    Scale shape: grams materialize once inside the scan as DISTINCT
    (source, gram) rows; a doc-frequency band [2, 10] drops both
    single-source grams (no pair can share them) and boilerplate grams
    BEFORE the self-join, exactly the hot-shingle capping discipline of
    minhash_candidate_pairs — the join fan-out is bounded by band_width^2
    per gram, never corpus^2. Output is one row per source pair (<=
    sources^2 / 2 rows, calendar-grain tiny).
    """
    docs = _t(spark, sf, "documents")
    g = docs.select(
        "source", F.explode(word_shingles(F.col("text"), 8)).alias("g")
    ).distinct()
    kept = (
        g.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 10))
    )
    banded = g.join(kept.select("g"), "g")
    a = banded.select(F.col("source").alias("source_a"), "g")
    b = banded.select(F.col("source").alias("source_b"), "g")
    return (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


_register(QuerySpec(
    name="x_text_overlap_matrix",
    survey="north-star: cross-source n-gram overlap matrix (mixing audit)",
    build=q_x_text_overlap_matrix,
    oracle="""
        WITH tk AS (
          SELECT source,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT source, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), kept AS (
          SELECT g FROM grams GROUP BY g
          HAVING COUNT(*) BETWEEN 2 AND 10
        ), banded AS (
          SELECT grams.source, grams.g FROM grams JOIN kept USING (g)
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM banded a JOIN banded b
          ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    """,
    tags=("text", "decontamination", "audit"),
))


def q_x_dedup_threshold_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-dedup threshold sweep: pair counts at every candidate
    cosine cutoff in ONE pass over the blocked pair set — the
    knob-choosing report a curator reads before committing to a dedup
    threshold (SemDeDup's epsilon sweep). Pairs enumerate once at the
    loosest cutoff; each tighter cutoff is a conditional sum in the same
    single aggregate, not a re-join.
    """
    emb = _t(spark, sf, "embeddings")
    cuts = [0.20, 0.25, 0.30, 0.35, 0.40, 0.50]
    pairs = embedding_near_dup_pairs(emb, threshold=min(cuts), block_col="label")
    wide = pairs.agg(
        *[
            F.sum((F.col("score") >= F.lit(t)).cast("long")).alias(f"__n{i}")
            for i, t in enumerate(cuts)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.coalesce(F.col(f"__n{i}"), F.lit(0)).alias("n_pairs"),
            )
            for i, t in enumerate(cuts)
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select(
        F.col("r.threshold").alias("threshold"),
        F.col("r.n_pairs").alias("n_pairs"),
    )


_register(QuerySpec(
    name="x_dedup_threshold_sweep",
    survey="north-star: dedup threshold sweep (epsilon-selection report)",
    build=q_x_dedup_threshold_sweep,
    oracle=f"""
        WITH pairs AS (
          SELECT ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 4)
                   AS score
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT threshold, CAST(COALESCE(SUM(CASE WHEN score >= threshold
                               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_pairs
        FROM pairs, (SELECT UNNEST(CAST([0.20, 0.25, 0.30, 0.35, 0.40, 0.50]
                                        AS DOUBLE[])) AS threshold) t
        WHERE score >= 0.20
        GROUP BY threshold
    """,
    tags=("dedup", "embedding", "report"),
))


def q_x_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram Jaccard near-dup scoring over co-shingled candidates (the
    exact verifier that runs on LSH candidates at scale).
    """
    docs = _t(spark, sf, "documents")
    # max_doc_freq=None: exact mode, pinned to the declarative oracle
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, shingle_n=3, max_doc_freq=None
    )


_register(QuerySpec(
    name="x_dedup_jaccard",
    survey="north-star: ngram jaccard dedup",
    build=q_x_dedup_jaccard,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), sizes AS (
          SELECT id, COUNT(*) AS n_shingles FROM shingles GROUP BY 1
        ), pairs AS (
          SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_common
          FROM shingles x JOIN shingles y ON x.sh = y.sh AND x.id < y.id
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               ROUND(p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common), 4)
                 AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.id_a = sa.id
        JOIN sizes sb ON p.id_b = sb.id
        WHERE p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common) >= 0.3
    """,
    tags=("dedup", "jaccard"),
))


def q_x_dedup_jaccard_capped(spark: SparkSession, sf: str) -> DataFrame:
    """Capped-fan-out Jaccard: the mandatory 100 TB knob. A shingle in d
    docs yields d(d-1)/2 pairs, so one boilerplate shingle in a million
    docs is 5e11 pairs; ``max_doc_freq`` drops shingles above the cap and
    Jaccard is computed over the CAPPED universe (intersections and set
    sizes both exclude dropped shingles). The oracle recomputes that capped
    universe exactly; the plan stays at the uncapped 4-exchange budget (the
    doc-frequency window reuses the shingle exchange).
    """
    docs = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, shingle_n=3, max_doc_freq=5
    )


_register(QuerySpec(
    name="x_dedup_jaccard_capped",
    survey="north-star: ngram jaccard dedup with doc-frequency fan-out cap",
    build=q_x_dedup_jaccard_capped,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), capped AS (
          SELECT id, sh FROM (
            SELECT id, sh, COUNT(*) OVER (PARTITION BY sh) AS dfreq
            FROM shingles
          ) WHERE dfreq <= 5
        ), sizes AS (
          SELECT id, COUNT(*) AS n_shingles FROM capped GROUP BY 1
        ), pairs AS (
          SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_common
          FROM capped x JOIN capped y ON x.sh = y.sh AND x.id < y.id
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               ROUND(p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common), 4)
                 AS jaccard
        FROM pairs p
        JOIN sizes sa ON p.id_a = sa.id
        JOIN sizes sb ON p.id_b = sb.id
        WHERE p.n_common / (sa.n_shingles + sb.n_shingles - p.n_common) >= 0.3
    """,
    tags=("dedup", "jaccard", "scale"),
))


def q_x_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash fingerprints (32-bit majority-vote over token hashes).
    Also verified against a pure-Python reference in tests; the SQL oracle
    re-derives every bit vote (md5 is the shared deterministic hash, hex ->
    int via DuckDB's '0x' cast, shifts/masks are portable).
    """
    docs = _t(spark, sf, "documents")
    return simhash(docs, "doc_id", "text", bits=32)


_register(QuerySpec(
    name="x_dedup_simhash",
    survey="north-star: simhash dedup",
    build=q_x_dedup_simhash,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 32)) AS u(j)
          GROUP BY 1, 2
        )
        SELECT id,
               CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                        ELSE 0 END) AS BIGINT) AS simhash
        FROM votes GROUP BY id
    """,
    tags=("dedup", "simhash"),
))


def q_x_dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 via pigeonhole
    banding (4 disjoint 15-bit bands over a 60-bit fingerprint; pairs
    within radius 3 must agree on >= 1 band exactly). One exchange on
    (band, band_bits); Hamming verify is bit_count(xor) computed during
    JVM-side bucket expansion. 60-bit/15-bit-band geometry matters at
    scale: 8-bit bands give only 256 buckets/band, which exhausts once
    the corpus passes a few thousand docs and sends expansion quadratic
    (measured 233 s at sf1 vs ~6 s with 32k buckets/band).
    ``max_bucket_size=None`` keeps the entry declarative for the oracle
    (the default caps hot buckets).
    """
    docs = _t(spark, sf, "documents")
    return simhash_near_pairs(
        docs, "doc_id", "text", bits=60, max_hamming=3, max_bucket_size=None
    )


_register(QuerySpec(
    name="x_dedup_simhash_pairs",
    survey="north-star: simhash near-dup pairs (pigeonhole Hamming bands)",
    build=q_x_dedup_simhash_pairs,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 60)) AS u(j)
          GROUP BY 1, 2
        ), fp AS (
          SELECT id,
                 CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY id
        ), bands AS (
          SELECT id, simhash, j AS band,
                 (simhash >> (j * 15)) & 32767 AS band_bits
          FROM fp, UNNEST(range(0, 4)) AS u(j)
        )
        SELECT DISTINCT a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_bits = b.band_bits AND a.id < b.id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("dedup", "simhash"),
))


def q_x_dedup_simhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash dedup survivors at the corpus-scale shape: 60-bit
    fingerprints, star edges within identical-fingerprint cohorts (linear,
    not clique), banding over DISTINCT fingerprints (15-bit bands = 32k
    buckets/band), components, anti-join losers. The scale companion to
    x_dedup_simhash_pairs' declarative clique.
    """
    docs = _t(spark, sf, "documents")
    return simhash_dedup(
        docs, "doc_id", "text", bits=60, max_hamming=3, max_bucket_size=None
    ).select("doc_id", "lang", "source", "n_chars")


_register(QuerySpec(
    name="x_dedup_simhash_dedup",
    survey="north-star: simhash dedup survivors (fingerprint-level banding)",
    bench=True,
    build=q_x_dedup_simhash_dedup,
    oracle="""
        WITH RECURSIVE toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS tok
          FROM documents
        ), hashed AS (
          SELECT id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks
        ), votes AS (
          SELECT id, j, SUM(((h >> j) & 1) * 2 - 1) AS v
          FROM hashed, UNNEST(range(0, 60)) AS u(j)
          GROUP BY 1, 2
        ), fp AS (
          SELECT id,
                 CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                          ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY id
        ), reps AS (
          SELECT simhash, MIN(id) AS rep FROM fp GROUP BY 1
        ), intra AS (
          SELECT r.rep AS id_a, f.id AS id_b
          FROM fp f JOIN reps r USING (simhash) WHERE f.id <> r.rep
        ), bands AS (
          SELECT rep AS id, simhash, j AS band,
                 (simhash >> (j * 15)) & 32767 AS band_bits
          FROM reps, UNNEST(range(0, 4)) AS u(j)
        ), inter AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_bits = b.band_bits AND a.id < b.id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ), alledges AS (
          SELECT id_a, id_b FROM intra UNION SELECT id_a, id_b FROM inter
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM alledges
          UNION
          SELECT id_b, id_a FROM alledges
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), losers AS (
          SELECT id FROM (SELECT id, MIN(lab) AS component FROM reach GROUP BY id)
          WHERE id <> component
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN losers l ON CAST(d.doc_id AS BIGINT) = l.id
        WHERE l.id IS NULL
    """,
    tags=("dedup", "simhash", "scale"),
))


def q_x_sim_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors — the exact ANN
    baseline. Query side broadcast; score is a JVM-side fold (zip_with +
    aggregate), no Python in the hot path.
    """
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10)


_register(QuerySpec(
    name="x_sim_bruteforce",
    survey="north-star: ANN brute-force cosine",
    build=q_x_sim_bruteforce,
    oracle="""
        WITH q AS (
          SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5
        ), scored AS (
          SELECT q.query_id, e.vec_id,
                 ROUND(
                   list_aggregate(list_transform(list_zip(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.q_vec,   x -> CAST(x AS DOUBLE))),
                     p -> p[1] * p[2]), 'sum')
                   / (sqrt(list_aggregate(list_transform(e.embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
                    * sqrt(list_aggregate(list_transform(q.q_vec,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)
                 AS score
          FROM embeddings e CROSS JOIN q
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    bench=True,
    tags=("similarity",),
))


def q_x_sim_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH bucketed ANN (the 100 TB scale path; recall < 1 by design —
    tests assert recall against brute force). The hyperplanes are md5-derived
    pseudo-random components, so the bucketing itself is deterministic and
    the oracle re-derives the exact same buckets + per-bucket top-k in SQL.
    """
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_bucketed_topk(emb, queries, k=10, n_planes=8)


_register(QuerySpec(
    name="x_sim_lsh",
    survey="north-star: ANN sign-LSH",
    build=q_x_sim_lsh,
    oracle=f"""
        WITH proj AS (
          SELECT vec_id, p,
                 list_aggregate(list_transform(range(0, len(embedding)),
                   d -> CAST(embedding[d + 1] AS DOUBLE) *
                        (CAST('0x' || substr(md5(CAST(p AS VARCHAR) || ':' ||
                                                 CAST(d AS VARCHAR)), 1, 8)
                              AS BIGINT) / 4294967296.0 - 0.5)),
                   'sum') AS proj
          FROM embeddings, UNNEST(range(0, 8)) AS u(p)
        ), buckets AS (
          SELECT vec_id,
                 string_agg(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, ''
                            ORDER BY p) AS bucket
          FROM proj GROUP BY vec_id
        ), c AS (
          SELECT e.vec_id, e.embedding AS c_vec, b.bucket
          FROM embeddings e JOIN buckets b USING (vec_id)
        ), q AS (
          SELECT e.vec_id AS query_id, e.embedding AS q_vec, b.bucket
          FROM embeddings e JOIN buckets b USING (vec_id)
          WHERE e.vec_id < 5
        ), scored AS (
          SELECT q.query_id, c.vec_id,
                 ROUND({_COS_SQL.format(a="c.c_vec", b="q.q_vec")}, 4) AS score
          FROM c JOIN q USING (bucket)
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    tags=("similarity", "lsh"),
))


def q_x_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text quality metrics per document: token counts (whitespace + BPE-ish
    regex), distinct ratio, quality score — all codegen'd expressions.
    """
    docs = _t(spark, sf, "documents")

    def tok_stats(toks: F.Column) -> F.Column:
        nd = F.size(F.array_distinct(toks))
        return F.struct(
            nd.cast("int").alias("nd"),
            F.round(
                nd.cast("double")
                / F.greatest(F.size(toks), F.lit(1)).cast("double"),
                4,
            ).alias("ratio"),
        )

    # the distinct/ratio pair folds over ONE let-bound token array;
    # inlined, each reference re-tokenizes the document
    ts = bind_once(tokenize(F.col("text")), tok_stats)
    return docs.select(
        "doc_id",
        token_count_ws("text").cast("int").alias("n_tokens_ws"),
        token_count_bpe("text").cast("int").alias("n_tokens_bpe"),
        ts["nd"].alias("n_distinct_tokens"),
        ts["ratio"].alias("distinct_ratio"),
        F.round(quality_score("text").cast("double"), 2).alias("quality"),
    )


_register(QuerySpec(
    name="x_text_stats",
    survey="north-star: text quality scoring / token counting",
    build=q_x_text_stats,
    oracle="""
        WITH t AS (
          SELECT doc_id, text,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws_toks,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), scored AS (
          SELECT doc_id, text, ws_toks, toks,
                 len(list_distinct(toks)) AS n_distinct,
                 len(toks) AS n_toks,
                 length(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g'))
                   / greatest(length(text), 1) AS punct_ratio,
                 len(list_filter(toks, x -> list_contains(
                     ['the','and','of','to','a','in','is','it','that','for'], x)))
                   / greatest(len(toks), 1) AS sw_ratio
          FROM t
        )
        SELECT doc_id,
               CAST(len(ws_toks) AS INT) AS n_tokens_ws,
               CAST(len(regexp_extract_all(text, '[A-Za-z]{1,4}'))
                  + len(regexp_extract_all(text, '[0-9]{1,3}'))
                  + len(regexp_extract_all(text, '[^\\sA-Za-z0-9]')) AS INT)
                 AS n_tokens_bpe,
               CAST(n_distinct AS INT) AS n_distinct_tokens,
               ROUND(CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1), 4) AS distinct_ratio,
               ROUND(CAST(
                 (CASE WHEN n_toks >= 20 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN punct_ratio < 0.2 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN sw_ratio >= 0.05 THEN 0.25 ELSE 0.0 END) +
                 (CASE WHEN CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1) >= 0.3
                       THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) AS quality
        FROM scored
    """,
    tags=("text",),
))


def q_x_text_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic (stopword-hit argmax) + content fingerprint
    (md5 over the sorted distinct token set).
    """
    docs = _t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        language_id("text").alias("lang_guess"),
        doc_fingerprint("text").alias("fingerprint"),
    )


_register(QuerySpec(
    name="x_text_langid",
    survey="north-star: language id / fingerprinting",
    build=q_x_text_langid,
    oracle="""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), hits AS (
          SELECT doc_id, toks,
                 len(list_filter(toks, x -> list_contains(
                   ['the','and','of','to','a','in','is','it','that','for'], x))) AS en,
                 len(list_filter(toks, x -> list_contains(
                   ['el','la','de','que','y','en','un','es','se','no'], x))) AS es,
                 len(list_filter(toks, x -> list_contains(
                   ['le','la','de','et','les','des','en','un','du','une'], x))) AS fr,
                 len(list_filter(toks, x -> list_contains(
                   ['der','die','und','das','von','zu','mit','den','ein','ist'], x))) AS de
          FROM t
        )
        SELECT doc_id,
               CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                    WHEN de >= en AND de >= es AND de >= fr
                         AND NOT (en >= de OR es >= de OR fr >= de) THEN 'de'
                    WHEN en >= es AND en >= fr AND en >= de THEN 'en'
                    WHEN es > en AND es >= fr AND es >= de THEN 'es'
                    WHEN fr > en AND fr > es AND fr >= de THEN 'fr'
                    ELSE 'de' END AS lang_guess,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
        FROM hits
    """,
    tags=("text", "langid"),
))


def q_x_multimodal_bytes(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal binary plumbing: text payloads as opaque binary columns —
    byte length + sha256 digest (the no-decode media dedup fast path).
    The mapInPandas decode stub is exercised in tests (no SQL equivalent).
    """
    docs = _t(spark, sf, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("int").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


_register(QuerySpec(
    name="x_multimodal_bytes",
    survey="north-star: multimodal binary columns",
    build=q_x_multimodal_bytes,
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS sha
        FROM documents
    """,
    tags=("multimodal",),
))


def q_x_text_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode NFC canonicalization ahead of exact dedup (x_dedup_exact):
    composed vs decomposed forms of the same text must hash identically.

    The fixture corpus is ASCII, so the builder appends a DECOMPOSED
    suffix (e + U+0301) to every document — the driver row then proves
    the UDF actually recomposes (changed is true everywhere and the
    normalized hash differs from the raw one); the oracle replays with
    DuckDB's native nfc_normalize. The normalization itself is the
    engine's second sanctioned pandas UDF (Catalyst has no Unicode
    normalization expression); the md5 stays JVM-side.
    """
    docs = _t(spark, sf, "documents")
    decomposed = F.concat(F.col("text"), F.lit(" café"))
    norm = nfc_normalize_text(decomposed)
    return docs.select(
        "doc_id",
        (norm != decomposed).alias("changed"),
        F.md5(norm).alias("norm_hash"),
    )


_register(QuerySpec(
    name="x_text_nfc",
    survey="north-star: text normalization (Unicode NFC, genuine-UDF class)",
    build=q_x_text_nfc,
    oracle="""
        SELECT doc_id,
               nfc_normalize(text || ' cafe' || chr(769))
                 <> (text || ' cafe' || chr(769)) AS changed,
               md5(nfc_normalize(text || ' cafe' || chr(769))) AS norm_hash
        FROM documents
    """,
    tags=("text", "normalize", "udf"),
))


def q_x_text_bpe_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The BPE-training merge statistic: corpus-wide adjacent-symbol pair
    frequencies (character bigrams within tokens, weighted by token
    occurrence) — each merge round of byte-pair-encoding tokenizer
    training picks argmax of exactly this table.

    Scale shape mirrors x_text_tfidf: pair extraction is a row-local
    higher-order fold inside the scan stage (split to chars, zip_with
    the shifted slice); the only exchange is the pair-vocabulary-grain
    groupBy whose map-side combine moves one row per distinct pair per
    partition, and top-20 rides TakeOrderedAndProject — at 100 TB one
    merge round is one narrow pass plus a sketch-sized shuffle.
    """
    docs = _t(spark, sf, "documents")

    def pairs_of(w):
        chars = F.split(w, "")
        n = F.size(chars)
        return F.when(
            n >= 2,
            F.zip_with(
                F.slice(chars, 1, n - 1),
                F.slice(chars, 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))

    pairs = docs.select(
        F.explode(
            F.flatten(F.transform(tokenize(F.col("text")), pairs_of))
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(20)
    )


_register(QuerySpec(
    name="x_text_bpe_pairs",
    survey="north-star: tokenizer training (BPE merge-pair statistics)",
    build=q_x_text_bpe_pairs,
    oracle="""
        WITH toks AS (
          SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-zA-Z0-9]+'),
                   x -> x <> '')) AS w
          FROM documents
        ), pairs AS (
          SELECT unnest(CASE WHEN length(w) >= 2
                   THEN list_transform(range(1, length(w)),
                          i -> substr(w, CAST(i AS INT), 1) || ' '
                               || substr(w, CAST(i AS INT) + 1, 1))
                   ELSE [] END) AS pair
          FROM toks
        )
        SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs GROUP BY pair
        ORDER BY cnt DESC, pair ASC LIMIT 20
    """,
    tags=("text", "tokenizer", "bpe"),
))


def q_x_multimodal_image_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-offset image-header parse over binary payloads, pure JVM.

    The testdata carries no image column, so the entry frames each
    document's bytes as a synthetic PNG / GIF89a / opaque payload (by
    doc_id mod 3, dimensions derived from doc_id) and then runs the REAL
    operator — ``image_dimensions`` reads format magic plus
    width/height straight out of the binary with substring/hex/conv
    expressions, no UDF, no decode library (the same parser is pytest-ed
    against byte-exact real PNG/GIF/BMP/JPEG headers). The oracle knows
    the ground-truth dimensions arithmetically, so a green row proves
    parse(frame(id)) round-trips: endianness, offsets, and magic
    detection are all load-bearing.

    Scale: header parsing is a narrow whole-stage-codegen projection —
    a resolution histogram over billions of stored images never leaves
    the JVM and shuffles only the final aggregate.
    """
    docs = _t(spark, sf, "documents")
    w = (F.lit(16) + F.col("doc_id") % 1905).cast("long")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 1065).cast("long")

    def be32(c):
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le16(c):
        return F.unhex(
            F.concat(
                F.lpad(F.hex(c % 256), 2, "0"),
                F.lpad(F.hex(F.shiftright(c, 8)), 2, "0"),
            )
        )

    filler = F.encode(F.substring("text", 1, 32), "utf-8")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),  # PNG signature
        F.unhex(F.lit("0000000D")),          # IHDR length
        F.encode(F.lit("IHDR"), "utf-8"),
        be32(w),
        be32(h),
        filler,
    )
    gif = F.concat(F.encode(F.lit("GIF89a"), "utf-8"), le16(w), le16(h), filler)
    raw = F.concat(F.unhex(F.lit("00")), filler)  # opaque: not an image
    payload = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, gif)
        .otherwise(raw)
    )
    return docs.select(
        "doc_id", image_dimensions(payload).alias("__m")
    ).select("doc_id", "__m.format", "__m.width", "__m.height")


_register(QuerySpec(
    name="x_multimodal_image_meta",
    survey="north-star: multimodal binary columns (typed metadata extract)",
    build=q_x_multimodal_image_meta,
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'png'
                    WHEN doc_id % 3 = 1 THEN 'gif' END AS format,
               CASE WHEN doc_id % 3 < 2
                    THEN CAST(16 + doc_id % 1905 AS INT) END AS width,
               CASE WHEN doc_id % 3 < 2
                    THEN CAST(16 + (doc_id * 7) % 1065 AS INT) END AS height
        FROM documents
    """,
    tags=("multimodal",),
))


# --------------------------------------------------------------------------
# Flagship: the customer-360 segmentation pipeline on TPC-H-ish tables
# --------------------------------------------------------------------------

def q_flagship_segments(spark: SparkSession, sf: str) -> DataFrame:
    """The whole reference view-DAG shape in one plan (EP2,
    sql/customer_360_views.sql): dedup -> join -> aggregate -> ordered
    distinct array -> segment/recency CASE ladders.

    Catalyst inlines all stages into one optimized plan: scan-level column
    pruning, one shuffle per key change, broadcast for the dim side.
    """
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    as_of = F.to_date(F.lit(AS_OF))

    # ONE shuffle on o_custkey: metrics and the ordered-distinct preference
    # array aggregate in the same groupBy (ordered_distinct_array over raw
    # rows = first occurrence at each value's max date, identical semantics
    # to the per-value-max formulation — and two fewer exchanges)
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("total_orders"),
        _dec_sum("o_totalprice", "lifetime_value"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.count(F.when(F.col("o_orderpriority").startswith("1"), 1)).alias("urgent_orders"),
        F.array_join(
            ordered_distinct_array(F.col("o_orderpriority"), F.to_date("o_orderdate")),
            ",",
        ).alias("preferred_priorities"),
    )
    joined = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").drop("o_custkey")
    return joined.select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce("total_orders", F.lit(0)).cast("long").alias("total_orders"),
        F.coalesce("lifetime_value", F.lit(0.0)).alias("lifetime_value"),
        "preferred_priorities",
        case_ladder(
            [
                (F.col("lifetime_value") >= 1000000, "VIP"),
                (F.col("lifetime_value") >= 500000, "Loyal"),
                (F.col("total_orders") >= 5, "Repeat"),
                (F.col("total_orders") >= 1, "Active"),
            ],
            default="Prospect",
        ).alias("customer_segment"),
        recency_bucket(
            F.col("last_order_date"), as_of,
            [(180, "Current"), (720, "Recent")],
            default="Lapsed", null_label="Never",
        ).alias("purchase_recency"),
    )


_register(QuerySpec(
    name="flagship_segments",
    survey="EP2: W1,J1,A1,A2,A3,F7,F11,F12",
    build=q_flagship_segments,
    oracle=f"""
        WITH per_cust AS (
          SELECT o_custkey, COUNT(*) AS total_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lifetime_value,
                 MAX(CAST(o_orderdate AS DATE)) AS last_order_date,
                 COUNT(CASE WHEN o_orderpriority LIKE '1%' THEN 1 END) AS urgent_orders
          FROM orders GROUP BY 1
        ), per_val AS (
          SELECT o_custkey, o_orderpriority AS v, MAX(CAST(o_orderdate AS DATE)) AS latest
          FROM orders GROUP BY 1, 2
        ), prefs AS (
          SELECT o_custkey,
                 string_agg(v, ',' ORDER BY latest DESC, v ASC) AS preferred_priorities
          FROM per_val GROUP BY 1
        )
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(COALESCE(pc.total_orders, 0) AS BIGINT) AS total_orders,
               COALESCE(pc.lifetime_value, 0.0) AS lifetime_value,
               p.preferred_priorities,
               CASE WHEN COALESCE(pc.lifetime_value, 0.0) >= 1000000 THEN 'VIP'
                    WHEN COALESCE(pc.lifetime_value, 0.0) >= 500000 THEN 'Loyal'
                    WHEN COALESCE(pc.total_orders, 0) >= 5 THEN 'Repeat'
                    WHEN COALESCE(pc.total_orders, 0) >= 1 THEN 'Active'
                    ELSE 'Prospect' END AS customer_segment,
               CASE WHEN pc.last_order_date IS NULL THEN 'Never'
                    WHEN date_diff('day', pc.last_order_date, DATE '{AS_OF}') <= 180 THEN 'Current'
                    WHEN date_diff('day', pc.last_order_date, DATE '{AS_OF}') <= 720 THEN 'Recent'
                    ELSE 'Lapsed' END AS purchase_recency
        FROM customer c
        LEFT JOIN per_cust pc ON c.c_custkey = pc.o_custkey
        LEFT JOIN prefs p ON c.c_custkey = p.o_custkey
    """,
    bench=True,
    tags=("flagship",),
))


# --------------------------------------------------------------------------
# Sources / sinks exercised as oracle-checked round trips (SURVEY §2.1)
# --------------------------------------------------------------------------

def _scratch(sf: str, leaf: str) -> str:
    """Deterministic per-SF scratch path for round-trip entries."""
    return f"/tmp/spark_graft_lake/{os.path.basename(sf.rstrip('/'))}/{leaf}"


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python workers.

    Pandas-UDF closures are cloudpickled BY REFERENCE to this module, so
    executors must be able to import it — true on a cluster via --py-files,
    but not guaranteed when the driver process imported us off an arbitrary
    sys.path entry. Zip the package once and addPyFile it (idempotent per
    session; harmless no-op cost otherwise).
    """
    flag = "__spark_graft_pkg_shipped__"
    jconf = spark.sparkContext.getConf()
    if jconf.get(flag, None) == "1":
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = f"/tmp/spark_graft_pkg_{os.getpid()}.zip"
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    jconf.set(flag, "1")


def q_p1_sql_over_frames(spark: SparkSession, sf: str) -> DataFrame:
    """P1/UD5: the sql-over-frames surface — frames in, SQL text, frame out.

    Mirrors the reference's ``sparkSqlQuery`` helper
    (glue_vehicle_sales_etl.py:28-36): register temp views, run Spark SQL.
    avg is computed as exact decimal sum / count so both engines emit
    bit-identical doubles.
    """
    return sql_over_frames(
        spark,
        """
        SELECT n.n_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
        customer_v=_t(spark, sf, "customer"),
        nation_v=_t(spark, sf, "nation"),
    )


_register(QuerySpec(
    name="p1_sql_over_frames",
    survey="P1,UD5",
    build=q_p1_sql_over_frames,
    oracle="""
        SELECT n.n_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS avg_bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    tags=("sql_surface",),
))


def q_s1_csv_typed_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S1/P3: header CSV scan + explicit cast projection, proven by round trip.

    Writes the customer table as CSV, reads it back through the typed reader
    (all-string scan -> per-column cast, PERMISSIVE corrupt capture,
    missing-column tolerance — glue_vehicle_sales_etl.py:54-68, 190-266),
    and aggregates. Matching the oracle run over the original parquet proves
    the CSV path loses nothing: types, nulls, negative decimals.
    """
    out = _scratch(sf, "customer_csv")
    c = _t(spark, sf, "customer")
    c.write.mode("overwrite").option("header", True).csv(out)
    typed = read_csv_typed(
        spark,
        out,
        {
            "c_custkey": "bigint",
            "c_name": "string",
            "c_nationkey": "int",
            "c_acctbal": "double",
            "c_mktsegment": "string",
            "loyalty_tier": "string",   # absent from the file -> typed NULL
        },
    )
    n_corrupt = (
        F.count("_corrupt_record")
        if "_corrupt_record" in typed.columns
        else F.sum(F.lit(0))
    )
    return typed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _dec_sum("c_acctbal", "sum_bal"),
        F.count("loyalty_tier").alias("n_loyalty"),
        n_corrupt.alias("n_corrupt"),
    )


_register(QuerySpec(
    name="s1_csv_typed_roundtrip",
    survey="S1,P3",
    build=q_s1_csv_typed_roundtrip,
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_rows,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
               CAST(0 AS BIGINT) AS n_loyalty, CAST(0 AS BIGINT) AS n_corrupt
        FROM customer GROUP BY c_mktsegment
    """,
    tags=("source", "csv"),
))


def q_s2_partitioned_lake(spark: SparkSession, sf: str) -> DataFrame:
    """S2/S6: hive-partitioned lake write + partition-pruned read-back.

    Writes orders partitioned by year with in-file date ordering
    (s3_upload_automation.py:187-224 key layout; SORTKEY analog), then reads
    back filtering one partition — the filter prunes to the single
    ``o_year=1996`` directory, the scan-side analog of Redshift's sortkey.
    """
    out = _scratch(sf, "orders_lake")
    o = _t(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate"))
    write_partitioned_lake(o, out, ("o_year",), sort_within=("o_orderdate",))
    lake = read_lake(spark, out)
    return (
        lake.filter(F.col("o_year") == 1996)
        .groupBy(F.month("o_orderdate").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice", "sum_price"),
        )
    )


_register(QuerySpec(
    name="s2_partitioned_lake",
    survey="S2,S6",
    build=q_s2_partitioned_lake,
    oracle="""
        SELECT month(o_orderdate) AS order_month, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE year(o_orderdate) = 1996
        GROUP BY month(o_orderdate)
    """,
    tags=("source", "lake", "partition_pruning"),
))


def q_s2_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """S2 under schema drift: a vendor adds a column between export batches
    (the DMS reality ApplyMapping absorbs column-by-column,
    glue_vehicle_sales_etl.py:190-266). Pre-1996 partitions are written
    WITHOUT ``o_big_ticket``; 1996+ partitions carry it. The evolved read
    (mergeSchema union-by-name) surfaces NULL for the old partitions — no
    historical rewrite — proven by aggregating the flag per year. Both
    writes use dynamic partition overwrite, so the entry is idempotent
    across re-runs.
    """
    out = _scratch(sf, "orders_lake_evolve")
    o = _t(spark, sf, "orders").withColumn("o_year", F.year("o_orderdate"))
    base = o.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_year"
    )
    write_partitioned_lake(base.filter(F.col("o_year") < 1996), out, ("o_year",))
    write_partitioned_lake(
        base.filter(F.col("o_year") >= 1996).withColumn(
            "o_big_ticket", F.col("o_totalprice") > F.lit(200000)
        ),
        out,
        ("o_year",),
    )
    lake = read_lake_evolved(spark, out)
    return lake.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_big_ticket"), 1)).alias("n_big_ticket"),
    )


_register(QuerySpec(
    name="s2_schema_evolution",
    survey="S2/S6 + P3: lake reads across schema drift (added columns)",
    build=q_s2_schema_evolution,
    oracle="""
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               COUNT(*) AS n_orders,
               CAST(COUNT(CASE WHEN year(o_orderdate) >= 1996
                                AND o_totalprice > 200000
                          THEN 1 END) AS BIGINT) AS n_big_ticket
        FROM orders GROUP BY 1
    """,
    tags=("source", "lake", "schema_evolution"),
))


def q_s2_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S2 in a second columnar format: orders written as ORC (snappy) and
    read back through an aggregation the oracle computes from the
    original table — proving the ORC writer/reader round-trips values,
    dates, and decimals bit-for-bit. Warehouse exports are not always
    parquet; ORC is the other columnar lake format Spark ships natively.
    """
    out = _scratch(sf, "orders_orc")
    o = _t(spark, sf, "orders")
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum("o_totalprice", "sum_price"),
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
    )


_register(QuerySpec(
    name="s2_orc_roundtrip",
    survey="S2/S6: second columnar lake format (ORC round trip)",
    build=q_s2_orc_roundtrip,
    oracle="""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               MAX(CAST(o_orderdate AS DATE)) AS last_order_date
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("source", "orc", "roundtrip"),
))


def q_s7_jsonl_sink_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S7/F18-F20/O2: Track-event assembly + JSONL sink, proven by round trip.

    Top-1000 orders by price (the reference's LIMIT-bounded activation pull,
    lambda_redshift_to_segment.py:207-208) are rendered as nested Segment
    Track events (:358-418), written through the JSONL sink, read back as
    text, and the identity fields re-extracted from the wire JSON. Matching
    the oracle (which computes the same fields straight from orders) proves
    struct assembly + JSON serialization round-trips exactly.
    """
    out = _scratch(sf, "track_events")
    o = _t(spark, sf, "orders")
    top = o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(1000)
    events = top.select(
        track_event_struct(
            user_id=mint_user_id("o_custkey"),
            event_name="Vehicle Purchased",
            msg_id=message_id("o_orderkey", "o_custkey"),
            timestamp=iso8601_noon("o_orderdate"),
            properties={
                "price": F.col("o_totalprice")
                .cast("decimal(18,2)")
                .cast("double"),
                "priority": F.col("o_orderpriority"),
            },
        ).alias("event")
    )
    write_jsonl_events(events, out)
    back = spark.read.text(out)
    return back.select(
        F.get_json_object("value", "$.messageId").alias("message_id"),
        F.get_json_object("value", "$.userId").alias("user_id"),
        F.get_json_object("value", "$.timestamp").alias("ts_iso"),
        F.get_json_object("value", "$.properties.price").cast("double").alias("price"),
        F.get_json_object("value", "$.properties.priority").alias("priority"),
    )


_register(QuerySpec(
    name="s7_jsonl_sink_roundtrip",
    survey="S7,F18,F19,F20,O2,UD2",
    build=q_s7_jsonl_sink_roundtrip,
    oracle="""
        SELECT 'vp_' || md5(o_orderkey || '_' || o_custkey) AS message_id,
               'AUTO-' || o_custkey AS user_id,
               strftime(o_orderdate, '%Y-%m-%dT12:00:00Z') AS ts_iso,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
               o_orderpriority AS priority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
    tags=("sink", "json"),
))


def q_s10_corrupt_jsonl(spark: SparkSession, sf: str) -> DataFrame:
    """S10 hardening: JSON-lines ingestion that QUARANTINES malformed
    payloads instead of dropping or failing. Writes the documents table as
    JSONL, plants three undecodable lines (truncated object, non-JSON
    text, bare array), reads back through the declared-schema PERMISSIVE
    reader, and classifies every line: parsed rows count under their lang,
    malformed lines under '__corrupt__' with the raw payload preserved for
    replay. The oracle proves zero silent loss: per-lang counts match the
    source exactly and the corrupt bucket is exactly the planted lines.
    """
    out = _scratch(sf, "documents_jsonl")
    docs = _t(spark, sf, "documents")
    docs.select("doc_id", "lang").write.mode("overwrite").json(out)
    bad = os.path.join(out, "part-99999-planted-bad.json")
    with open(bad, "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 1, "lang": "en"\n')
        fh.write("definitely not json\n")
        fh.write('[1, 2, 3]\n')
    typed = read_jsonl_typed(
        spark, out, {"doc_id": "bigint", "lang": "string"}
    )
    category = (
        F.when(F.col("_corrupt_record").isNotNull(), F.lit("__corrupt__"))
        .otherwise(F.col("lang"))
    )
    return typed.groupBy(category.alias("category")).agg(
        F.count(F.lit(1)).alias("n_lines")
    )


_register(QuerySpec(
    name="s10_corrupt_jsonl",
    survey="S10 + malformed-row capture (glue_vehicle_sales_etl.py:59)",
    build=q_s10_corrupt_jsonl,
    oracle="""
        SELECT lang AS category, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM documents GROUP BY 1
        UNION ALL
        SELECT '__corrupt__', CAST(3 AS BIGINT)
    """,
    tags=("source", "json", "quarantine"),
))


def q_p4_softdelete_optout(spark: SparkSession, sf: str) -> DataFrame:
    """P4/P7/F17: soft-delete + GDPR opt-out filtering with NULL-able flags.

    Flags are derived deterministically from the data (no fixture columns
    exist for them); the operator under test is the reference's exact
    predicate shape: ``(isdeleted IS NULL OR isdeleted = false)`` — NULL
    must pass — and ``NOT COALESCE(opt_out, false)``
    (customer_360_views.sql:77-80, 603-608, 725-737).
    """
    c = _t(spark, sf, "customer")
    isdeleted = (
        F.when(F.col("c_acctbal") < 0, F.lit(True))
        .when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    opt_out = (
        F.when(F.col("c_custkey") % 5 == 0, F.lit(True))
        .when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    flagged = c.withColumn("isdeleted", isdeleted).withColumn("opt_out", opt_out)
    return (
        flagged.filter(
            (F.col("isdeleted").isNull() | (F.col("isdeleted") == F.lit(False)))
            & ~F.coalesce(F.col("opt_out"), F.lit(False))
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_marketable"),
            _dec_sum("c_acctbal", "sum_bal"),
        )
    )


_register(QuerySpec(
    name="p4_softdelete_optout",
    survey="P4,P7,F17",
    build=q_p4_softdelete_optout,
    oracle="""
        WITH flagged AS (
          SELECT *,
            CASE WHEN c_acctbal < 0 THEN TRUE
                 WHEN c_custkey % 7 = 0 THEN NULL ELSE FALSE END AS isdeleted,
            CASE WHEN c_custkey % 5 = 0 THEN TRUE
                 WHEN c_custkey % 11 = 0 THEN NULL ELSE FALSE END AS opt_out
          FROM customer)
        SELECT c_mktsegment, COUNT(*) AS n_marketable,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM flagged
        WHERE (isdeleted IS NULL OR isdeleted = FALSE)
          AND NOT COALESCE(opt_out, FALSE)
        GROUP BY c_mktsegment
    """,
    tags=("filter", "gdpr"),
))


def q_p12_validation(spark: SparkSession, sf: str) -> DataFrame:
    """P12: ingest-stream validation predicates (shape checks on raw events).

    The reference validates capture payloads with express-validator
    (api-server.js:106-156: notEmpty / isISO8601 / format checks); here the
    same gate is regex + null + range predicates counted per event type.
    """
    e = _t(spark, sf, "events")
    valid = (
        F.col("props").rlike(r'^[{]"k": [0-9]+[}]$')
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("value") >= 0)
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(valid, 1)).alias("n_valid"),
    )


_register(QuerySpec(
    name="p12_validation",
    survey="P12,A2",
    build=q_p12_validation,
    oracle="""
        SELECT event_type, COUNT(*) AS n_total,
               COUNT(*) FILTER (WHERE regexp_matches(props, '^[{]"k": [0-9]+[}]$')
                 AND ts IS NOT NULL AND user_id IS NOT NULL AND value >= 0)
                 AS n_valid
        FROM events GROUP BY event_type
    """,
    tags=("filter", "validation"),
))


def q_p_dq_report(spark: SparkSession, sf: str) -> DataFrame:
    """Declarative data-quality gate over orders: required-column nulls,
    PK uniqueness, a value-range bound, and referential integrity against
    the customer dimension — ALL folded into one aggregate over one scan
    (the FK check rides as a broadcast left-join hit indicator). The
    single-pass report a pipeline can assert on before publishing.
    """
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return dq_report(
        o,
        not_null=("o_custkey", "o_orderdate"),
        unique=("o_orderkey",),
        ranges=(("totalprice_nonneg", F.col("o_totalprice") >= 0),),
        fk=(("o_custkey",), c, ("c_custkey",)),
    )


_register(QuerySpec(
    name="p_dq_report",
    survey="beyond-reference: single-pass DQ expectations (P11/P12 as a gate)",
    build=q_p_dq_report,
    oracle="""
        WITH j AS (
          SELECT o.*, CASE WHEN c.c_custkey IS NOT NULL THEN 1 END AS hit
          FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
            ON o.o_custkey = c.c_custkey
        ), agg AS (
          SELECT COUNT(*) AS n_rows,
                 SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS v0,
                 SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v1,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS v2,
                 SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END) AS v3,
                 SUM(CASE WHEN o_custkey IS NOT NULL AND hit IS NULL
                     THEN 1 ELSE 0 END) AS v4
          FROM j
        )
        SELECT check_name, n_rows, n_violations,
               CAST(n_violations = 0 AS INT) AS passed
        FROM (
          SELECT 'not_null:o_custkey' AS check_name, n_rows,
                 CAST(v0 AS BIGINT) AS n_violations FROM agg
          UNION ALL SELECT 'not_null:o_orderdate', n_rows,
                 CAST(v1 AS BIGINT) FROM agg
          UNION ALL SELECT 'unique:o_orderkey', n_rows,
                 CAST(v2 AS BIGINT) FROM agg
          UNION ALL SELECT 'range:totalprice_nonneg', n_rows,
                 CAST(v3 AS BIGINT) FROM agg
          UNION ALL SELECT 'fk:o_custkey', n_rows,
                 CAST(v4 AS BIGINT) FROM agg
        )
    """,
    tags=("validation", "dq"),
))


def q_p_winsorize(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-exact per-group winsorization: order amounts clamped to their
    priority class's [p05, p95] — the outlier-capping step a financial
    rollup runs before averaging so one fat-fingered deal can't move a
    segment metric. Percentiles are RANK-SELECTED values (the
    x_corpus_quantiles discipline), never interpolated: k = ceil(p*n) via
    pure integer math, so both engines pick the identical element and
    clamping is selection, not float arithmetic.

    One shuffle total: the rank window partitions by priority, the
    threshold aggregate reuses that partitioning (no second exchange),
    and the thresholds (one row per class) broadcast back onto the
    already-partitioned rows.
    """
    o = _t(spark, sf, "orders")
    w_rank = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_all = Window.partitionBy("o_orderpriority").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = o.select("o_orderkey", "o_orderpriority", "o_totalprice").withColumn(
        "rn", F.row_number().over(w_rank)
    ).withColumn("n", F.count(F.lit(1)).over(w_all))
    k_lo = F.expr("(n * 5 + 99) div 100")    # ceil(0.05 n), exact ints
    k_hi = F.expr("(n * 95 + 99) div 100")   # ceil(0.95 n)
    thresholds = (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.min(F.when(F.col("rn") == k_lo, F.col("o_totalprice"))).alias("lo"),
            F.min(F.when(F.col("rn") == k_hi, F.col("o_totalprice"))).alias("hi"),
        )
    )
    return (
        ranked.drop("rn", "n")
        .join(F.broadcast(thresholds), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
            .alias("price_winsorized"),
        )
    )


_register(QuerySpec(
    name="p_winsorize",
    survey="extension: rank-exact per-group winsorization (outlier capping)",
    build=q_p_winsorize,
    oracle="""
        WITH ranked AS (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        ), thresholds AS (
          SELECT o_orderpriority,
                 MIN(CASE WHEN rn = (n * 5 + 99) // 100
                          THEN o_totalprice END) AS lo,
                 MIN(CASE WHEN rn = (n * 95 + 99) // 100
                          THEN o_totalprice END) AS hi
          FROM ranked GROUP BY 1
        )
        SELECT r.o_orderkey, r.o_orderpriority, r.o_totalprice,
               LEAST(GREATEST(r.o_totalprice, t.lo), t.hi) AS price_winsorized
        FROM ranked r JOIN thresholds t USING (o_orderpriority)
    """,
    tags=("cleaning", "robust-stats"),
))


def q_f24_adf_parse(spark: SparkSession, sf: str) -> DataFrame:
    """F24/UD3: ADF/XML lead parsing — the engine's one genuine pandas UDF.

    ADF XML is synthesized deterministically per customer, parsed with the
    Arrow-batched XML parser (api-server.js:28, 228-245 semantics: contact
    names by part attribute, vehicle interest, session id mined from
    comments). The oracle computes the expected fields directly from the
    generating columns, so the parser is checked against ground truth rather
    than against another XML library.
    """
    _ship_package(spark)  # pandas UDF: workers must import this package
    c = _t(spark, sf, "customer")
    ck = F.col("c_custkey").cast("string")
    xml = F.concat(
        F.lit('<?xml version="1.0"?><adf><prospect><id>LEAD-'), ck,
        F.lit('</id><customer><contact><name part="first">F'), ck,
        F.lit('</name><name part="last">'), F.col("c_name"),
        F.lit('</name><email>cust'), ck,
        F.lit('@example.com</email><phone>555-'),
        F.lpad(ck, 7, "0"),
        F.lit("</phone></contact></customer><vehicle><year>"),
        (F.lit(1990) + F.col("c_custkey") % 10).cast("string"),
        F.lit("</year><make>MAKE"), (F.col("c_custkey") % 5).cast("string"),
        F.lit("</make><model>MODEL"), (F.col("c_custkey") % 3).cast("string"),
        F.lit("</model></vehicle><comments>"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(F.lit("SD_SESSION: sess_"), ck),
        ).otherwise(F.lit("no session")),
        F.lit("</comments></prospect></adf>"),
    )
    lead = parsed_lead(xml)
    return c.select(
        "c_custkey",
        lead.getField("lead_id").alias("lead_id"),
        lead.getField("first_name").alias("first_name"),
        lead.getField("last_name").alias("last_name"),
        lead.getField("email").alias("email"),
        lead.getField("phone").alias("phone"),
        lead.getField("vehicle_year").alias("vehicle_year"),
        lead.getField("vehicle_make").alias("vehicle_make"),
        lead.getField("vehicle_model").alias("vehicle_model"),
        lead.getField("session_id").alias("session_id"),
    )


_register(QuerySpec(
    name="f24_adf_parse",
    survey="F24,UD3",
    build=q_f24_adf_parse,
    oracle="""
        SELECT c_custkey,
               'LEAD-' || c_custkey AS lead_id,
               'F' || c_custkey AS first_name,
               c_name AS last_name,
               'cust' || c_custkey || '@example.com' AS email,
               '555-' || lpad(CAST(c_custkey AS VARCHAR), 7, '0') AS phone,
               CAST(1990 + c_custkey % 10 AS VARCHAR) AS vehicle_year,
               'MAKE' || (c_custkey % 5) AS vehicle_make,
               'MODEL' || (c_custkey % 3) AS vehicle_model,
               CASE WHEN c_custkey % 3 = 0 THEN 'sess_' || c_custkey END AS session_id
        FROM customer
    """,
    tags=("udf", "xml"),
))


def q_st7_retention(spark: SparkSession, sf: str) -> DataFrame:
    """ST7: GDPR retention sweep — expire rows older than the cutoff.

    The reference deletes unmatched sessions past 2 years
    (database-schema.sql:364-380); here the window is 14 days before the
    fixed as-of so both branches are populated. Output reports what a
    filtered-rewrite would keep vs drop per event type (A2 conditional
    counts), with the newest surviving day as an audit column.
    """
    e = _t(spark, sf, "events")
    cutoff = F.to_timestamp(
        F.date_sub(F.to_date(F.lit(EVENTS_AS_OF)), 14)
    )
    keep = F.col("ts") >= cutoff
    return e.groupBy("event_type").agg(
        F.count(F.when(keep, 1)).alias("n_retained"),
        F.count(F.when(~keep, 1)).alias("n_expired"),
        F.max(F.when(keep, F.to_date("ts"))).alias("newest_retained_day"),
    )


_register(QuerySpec(
    name="st7_retention",
    survey="ST7,A2,F12",
    build=q_st7_retention,
    oracle=f"""
        SELECT event_type,
               COUNT(*) FILTER (WHERE ts >= TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY)
                 AS n_retained,
               COUNT(*) FILTER (WHERE ts <  TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY)
                 AS n_expired,
               MAX(CASE WHEN ts >= TIMESTAMP '{{EVENTS_AS_OF}}' - INTERVAL 14 DAY
                        THEN CAST(ts AS DATE) END) AS newest_retained_day
        FROM events GROUP BY event_type
    """.replace("{EVENTS_AS_OF}", EVENTS_AS_OF),
    tags=("retention",),
))


# --------------------------------------------------------------------------
# Training-data extensions: embedding near-dup + IVF ANN
# --------------------------------------------------------------------------

def q_x_dedup_embed(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label.

    Pair enumeration is an equi self-join on the block key (here the label
    column; at scale an IVF cell or LSH bucket) — never an unblocked cross
    product. The synthetic embeddings are not clustered tightly, so the
    threshold is 0.30 (top ~1% of within-block pairs) to keep the check
    non-vacuous.
    """
    emb = _t(spark, sf, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.30, block_col="label")


_register(QuerySpec(
    name="x_dedup_embed",
    survey="north-star: embedding-cosine near-dup",
    build=q_x_dedup_embed,
    oracle=f"""
        SELECT a_id, b_id, score FROM (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                 ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 4) AS score
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE score >= 0.30
    """,
    tags=("dedup", "embedding"),
))


def q_x_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate clusters: connected components (min-label propagation) over
    the embedding near-dup pair graph. The oracle re-derives the same
    components with a recursive CTE (transitive min-reachability), so the
    iterative Spark algorithm is checked end-to-end against declarative SQL.
    """
    emb = _t(spark, sf, "embeddings")
    pairs = embedding_near_dup_pairs(emb, threshold=0.30, block_col="label")
    return connected_components(pairs)


_register(QuerySpec(
    name="x_dedup_clusters",
    survey="north-star: duplicate clustering (connected components)",
    build=q_x_dedup_clusters,
    oracle=f"""
        WITH RECURSIVE pairs AS (
          SELECT a_id, b_id FROM (
            SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 4) AS score
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id)
          WHERE score >= 0.30
        ), edges AS (
          SELECT a_id AS src, b_id AS dst FROM pairs
          UNION
          SELECT b_id, a_id FROM pairs
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        )
        SELECT id, MIN(lab) AS component FROM reach GROUP BY id
    """,
    tags=("dedup", "clustering"),
))


def q_j5_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """J5 generalized: as-of join — each event matched to the user's latest
    order at or before the event time (union + one-window implementation;
    no range-join pair blowup). Aggregated per event_type so the result is
    compact; the oracle re-derives the same match with a windowed
    formulation.
    """
    e = _t(spark, sf, "events")
    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate"),
        F.col("o_orderkey"),
        F.col("o_totalprice"),
    )
    joined = asof_join(
        e.select("event_id", "user_id", "ts", "event_type"),
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_totalprice", "o_orderkey"],
        tiebreak="o_orderkey",
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("matched_o_orderkey").alias("n_matched"),
        _dec_sum("matched_o_totalprice", "sum_matched_price"),
        F.max("matched_o_orderdate").alias("latest_matched_order"),
    )


_register(QuerySpec(
    name="j5_asof_join",
    survey="J5 (generalized): as-of / point-in-time join",
    build=q_j5_asof_join,
    oracle="""
        WITH best AS (
          SELECT e.event_id, e.event_type, o.o_totalprice, o.o_orderkey,
                 o.o_orderdate,
                 ROW_NUMBER() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC,
                                             o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        ), m AS (
          SELECT * FROM best WHERE rn = 1
        )
        SELECT e.event_type,
               COUNT(*) AS n_events,
               COUNT(m.o_orderkey) AS n_matched,
               CAST(SUM(CAST(m.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_matched_price,
               MAX(m.o_orderdate) AS latest_matched_order
        FROM events e LEFT JOIN m ON e.event_id = m.event_id
        GROUP BY e.event_type
    """,
    tags=("join", "asof"),
))


def q_j5_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof tolerance):
    each purchase event takes the user's latest PRIOR view event, but only
    if it happened within the last hour — older views are treated as no
    match, the attribution-window semantics of the reference's 24h
    contact+time fallback (J5). The bound is a row-local predicate on the
    already-found match, so the one-window as-of plan is unchanged.
    """
    e = _t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
        "value",
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        right_cols=["value", "view_id"],
        tiebreak="view_id",
        tolerance="1 hour",
    )
    return joined.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("matched_view_ts").alias("n_matched_1h"),
        _dec_sum("matched_value", "sum_matched_value"),
    )


_register(QuerySpec(
    name="j5_asof_tolerance",
    survey="J5 (generalized): as-of join with staleness tolerance",
    build=q_j5_asof_tolerance,
    oracle="""
        WITH p AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
        ), v AS (
          SELECT user_id, ts AS vts, event_id AS vid, value FROM events
          WHERE event_type = 'view'
        ), best AS (
          SELECT p.event_id, p.ts AS pts, v.vts, v.value,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY v.vts DESC, v.vid DESC) AS rn
          FROM p JOIN v ON p.user_id = v.user_id AND v.vts <= p.ts
        ), m AS (
          SELECT event_id,
                 CASE WHEN vts >= pts - INTERVAL 1 HOUR THEN vts END AS mts,
                 CASE WHEN vts >= pts - INTERVAL 1 HOUR THEN value END AS mval
          FROM best WHERE rn = 1
        )
        SELECT CAST(p.ts AS DATE) AS day,
               COUNT(*) AS n_purchases,
               COUNT(m.mts) AS n_matched_1h,
               CAST(SUM(CAST(m.mval AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_matched_value
        FROM p LEFT JOIN m USING (event_id)
        GROUP BY 1
    """,
    tags=("join", "asof", "tolerance"),
))


def q_j5_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval join (binned, no cross product): for each event, the other
    events of the same user in the following hour — the follow-up-activity
    correlation behind ST5's session gap. Aggregated per event_type pair.
    """
    e = _t(spark, sf, "events").select("event_id", "user_id", "ts", "event_type")
    followed = range_join(
        e,
        e.select(
            F.col("event_id").alias("event_id2"),
            "user_id",
            F.col("ts").alias("ts2"),
            F.col("event_type").alias("event_type2"),
        ),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts2",
        lower_s=1,
        upper_s=3600,
    )
    return followed.groupBy("event_type", F.col("r_event_type2").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_followups")
    )


_register(QuerySpec(
    name="j5_range_join",
    survey="J5 (generalized): interval/range join (binned)",
    build=q_j5_range_join,
    oracle="""
        SELECT a.event_type, b.event_type AS next_type,
               COUNT(*) AS n_followups
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts + INTERVAL 1 SECOND
         AND b.ts <= a.ts + INTERVAL 3600 SECOND
        GROUP BY 1, 2
    """,
    tags=("join", "range"),
))


def q_w_extended(spark: SparkSession, sf: str) -> DataFrame:
    """Window surface beyond the reference's ROW_NUMBER-only usage (SURVEY
    §2.5): rank, dense_rank, lag/lead, and a running-sum frame
    (rowsBetween unbounded->current) — all free in Spark, exposed so a
    reference user gains them without custom SQL.
    """
    o = _t(spark, sf, "orders")
    w_order = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w_price).alias("price_rank"),
        F.dense_rank().over(w_price).alias("price_dense_rank"),
        F.lag(F.to_date("o_orderdate"), 1).over(w_order).alias("prev_order_date"),
        F.lead(F.to_date("o_orderdate"), 1).over(w_order).alias("next_order_date"),
        (F.sum(_cents("o_totalprice")).over(running).cast("double") / 100.0)
        .alias("running_spend"),
    )


_register(QuerySpec(
    name="w_extended",
    survey="extension: rank/dense_rank/lag/lead/frames (beyond reference W1-W4)",
    build=q_w_extended,
    oracle="""
        SELECT o_orderkey, o_custkey,
               RANK() OVER w_price AS price_rank,
               DENSE_RANK() OVER w_price AS price_dense_rank,
               LAG(CAST(o_orderdate AS DATE), 1) OVER w_order AS prev_order_date,
               LEAD(CAST(o_orderdate AS DATE), 1) OVER w_order AS next_order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders
        WINDOW
          w_price AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC),
          w_order AS (PARTITION BY o_custkey
                      ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
    """,
    tags=("window",),
))


def q_w_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history built from a change stream:
    each customer's orders become versioned rows with [valid_from,
    valid_to) intervals via LEAD over the per-key timeline; the open
    interval (valid_to IS NULL) marks the current version. The reference
    only keeps latest-wins state (SCD1 MERGE, glue job DELETE+INSERT);
    type-2 is the companion shape for as-of auditability — one shuffle on
    the dimension key, same budget as W1.
    """
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.to_date("o_orderdate").alias("valid_from"),
        F.lead(F.to_date("o_orderdate"), 1).over(w).alias("valid_to"),
    ).withColumn(
        "is_current", F.col("valid_to").isNull().cast("int")
    )


_register(QuerySpec(
    name="w_scd2_history",
    survey="extension: SCD type-2 validity intervals (beyond reference SCD1 MERGE)",
    build=q_w_scd2_history,
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS valid_from,
               LEAD(CAST(o_orderdate AS DATE), 1) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
               ) AS valid_to,
               CAST(CASE WHEN LEAD(CAST(o_orderdate AS DATE), 1) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
               ) IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
        FROM orders
    """,
    tags=("window", "scd2"),
))


def q_u_scd2_merge(spark: SparkSession, sf: str) -> DataFrame:
    """SCD type-2 MERGE-apply: a change batch lands on a versioned
    dimension — changed keys close their current row and open a new one,
    unchanged updates are no-ops (idempotent re-delivery), brand-new keys
    insert open rows, history rows pass through untouched. Completes the
    type-2 story: w_scd2_history BUILDS intervals from history,
    scd2_merge MAINTAINS them incrementally (the reference stops at SCD1
    DELETE+INSERT, glue_vehicle_sales_etl.py:289-392).

    Fixture-derived deterministic cases: every customer is current with
    its mktsegment; keys %3==0 carry a closed 'OLD' history row; the
    batch updates keys %5==0 (of which %10==0 keep their segment — no-op)
    and inserts %100==0 under shifted NEW keys.
    """
    c = _t(spark, sf, "customer")
    d95, d94, eff = "1995-01-01", "1994-01-01", "1995-06-01"
    cur = c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(d95).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(1).cast("int").alias("is_current"),
    )
    hist = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("custkey"),
        F.lit("OLD").alias("segment"),
        F.lit(d94).cast("date").alias("valid_from"),
        F.lit(d95).cast("date").alias("valid_to"),
        F.lit(0).cast("int").alias("is_current"),
    )
    target = hist.unionByName(cur)
    updates = (
        c.filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_mktsegment"))
            .otherwise(F.lit("MOVED"))
            .alias("segment"),
            F.lit(eff).cast("date").alias("effective_at"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 100 == 0).select(
                (F.col("c_custkey") + 1_000_000).alias("custkey"),
                F.lit("NEWKEY").alias("segment"),
                F.lit(eff).cast("date").alias("effective_at"),
            )
        )
    )
    return scd2_merge(target, updates, keys=["custkey"], tracked=["segment"])


_register(QuerySpec(
    name="u_scd2_merge",
    survey="S5/J7 type-2 companion: SCD2 MERGE-apply (close + open + insert)",
    build=q_u_scd2_merge,
    oracle="""
        WITH cur AS (
          SELECT c_custkey AS custkey, c_mktsegment AS segment,
                 DATE '1995-01-01' AS valid_from,
                 CAST(NULL AS DATE) AS valid_to, 1 AS is_current
          FROM customer
        ), hist AS (
          SELECT c_custkey AS custkey, 'OLD' AS segment,
                 DATE '1994-01-01' AS valid_from,
                 DATE '1995-01-01' AS valid_to, 0 AS is_current
          FROM customer WHERE c_custkey % 3 = 0
        ), upd AS (
          SELECT c_custkey AS custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment
                      ELSE 'MOVED' END AS segment,
                 DATE '1995-06-01' AS eff
          FROM customer WHERE c_custkey % 5 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 'NEWKEY', DATE '1995-06-01'
          FROM customer WHERE c_custkey % 100 = 0
        ), j AS (
          SELECT COALESCE(c.custkey, u.custkey) AS custkey,
                 c.segment AS c_seg, c.valid_from AS c_vf,
                 u.segment AS u_seg, u.eff,
                 c.custkey IS NOT NULL AS has_c,
                 u.custkey IS NOT NULL AS has_u
          FROM cur c FULL OUTER JOIN upd u ON c.custkey = u.custkey
        )
        SELECT custkey, segment, valid_from, valid_to,
               CAST(is_current AS INT) AS is_current
        FROM (
          SELECT custkey, segment, valid_from, valid_to, is_current FROM hist
          UNION ALL
          SELECT custkey, c_seg, c_vf, CAST(NULL AS DATE), 1
          FROM j WHERE has_c AND (NOT has_u OR c_seg IS NOT DISTINCT FROM u_seg)
          UNION ALL
          SELECT custkey, c_seg, c_vf, eff, 0
          FROM j WHERE has_c AND has_u AND c_seg IS DISTINCT FROM u_seg
          UNION ALL
          SELECT custkey, u_seg, eff, CAST(NULL AS DATE), 1
          FROM j WHERE has_u AND (NOT has_c OR c_seg IS DISTINCT FROM u_seg)
        )
    """,
    tags=("merge", "scd2", "upsert"),
))


def q_a_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-grain aggregate as a real ROLLUP (the reference's
    match_analytics dual daily/hourly grain, database-schema.sql:196-229,
    generalized): per (status, priority), per status, and grand total in one
    pass, with GROUPING() flags distinguishing the grains.
    """
    o = _t(spark, sf, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice", "sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority",
            "g_status", "g_priority", "n_orders", "sum_price",
        )
    )


_register(QuerySpec(
    name="a_rollup",
    survey="A9 (generalized): ROLLUP multi-grain with GROUPING flags",
    build=q_a_rollup,
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
))


def q_a_approx(spark: SparkSession, sf: str) -> DataFrame:
    """A6 at 100 TB: sketch-based aggregates. Exact COUNT(DISTINCT) is the
    oracle-checked default (j6_a8_attribution); at scale the HLL/quantile
    sketches trade bounded error for one-pass mergeability.

    Sketch values are engine-specific, so the query emits the exact
    aggregates plus in-query error-bound FLAGS: |HLL − exact|/exact ≤ 0.1
    (5× the declared rsd=0.02) and approx-median within the exact p45–p55
    band. The DuckDB oracle asserts the flags are 1 — the driver hash goes
    red the moment a sketch drifts out of tolerance, making accuracy a hard
    driver-checked property instead of a pytest-only one.
    """
    li = _t(spark, sf, "lineitem")
    # Two aggregates joined at group grain, NOT one: mixing a DISTINCT
    # aggregate with plain ones makes the planner Expand-duplicate every
    # input row (one copy per aggregate family), which doubled 60M rows
    # through two exchanges and ran 152 s at sf1. Split, each side plans
    # its own partial-aggregated single pass (4.5 s + 5 s), and the join
    # is three rows per side.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("hll_orders"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("apx_median"),
        F.expr("percentile(l_quantity, 0.45)").alias("p45"),
        F.expr("percentile(l_quantity, 0.55)").alias("p55"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    agg = exact.join(F.broadcast(sketches), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        F.when(
            F.abs(F.col("hll_orders") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= 0.1,
            1,
        ).otherwise(0).cast("int").alias("hll_ok"),
        F.when(
            F.col("apx_median").cast("double").between(
                F.col("p45"), F.col("p55")
            ),
            1,
        ).otherwise(0).cast("int").alias("median_ok"),
    )


_register(QuerySpec(
    name="a_approx",
    survey="A6 (scale variant): HLL approx_count_distinct + approx percentile",
    build=q_a_approx,
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               COUNT(*) AS n_rows,
               CAST(1 AS INT) AS hll_ok,
               CAST(1 AS INT) AS median_ok
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "sketch"),
))


def q_x_multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal frame-sampling PLAN (metadata-only, no decode): synthesize
    per-media durations deterministically from events, explode the sampled
    frame offsets (every 500 ms), and count planned frames. The explode is a
    JVM sequence — the decode pass later touches only sampled frames.
    """
    e = _t(spark, sf, "events")
    media = e.select(
        F.col("event_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit("video/mp4").alias("mime"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            ((F.col("event_id") % 7) * 1000 + 500).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    frames = frame_sample_plan(media, every_ms=500)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("frame_ms").cast("long").alias("last_frame_ms"),
    )


_register(QuerySpec(
    name="x_multimodal_frames",
    survey="north-star: multimodal frame-sample planning",
    build=q_x_multimodal_frames,
    oracle="""
        WITH media AS (
          SELECT event_id AS media_id,
                 CAST((event_id % 7) * 1000 + 500 AS INT) AS duration_ms
          FROM events
        )
        SELECT m.media_id,
               COUNT(*) AS n_frames,
               CAST(MAX(f.frame_ms) AS BIGINT) AS last_frame_ms
        FROM media m,
             LATERAL (SELECT unnest(generate_series(0,
                        greatest(m.duration_ms - 1, 0), 500)) AS frame_ms) f
        GROUP BY m.media_id
    """,
    tags=("multimodal", "frames"),
))


def q_a_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (crosstab) aggregate: order counts per status spread across
    priority columns — groupBy().pivot() with explicit values so the output
    schema is static (required both for oracle hashing and for sane plans
    at scale: dynamic pivot needs an extra distinct-values job).
    """
    o = _t(spark, sf, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("o_orderstatus")]
    for p in prios:
        alias = "n_" + p.split("-")[0]
        cols.append(F.coalesce(F.col(f"`{p}`"), F.lit(0)).cast("long").alias(alias))
    return pivoted.select(*cols)


_register(QuerySpec(
    name="a_pivot",
    survey="extension: pivot/crosstab aggregate",
    build=q_a_pivot,
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_1,
               COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_2,
               COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_3,
               COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_4,
               COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_5
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg", "pivot"),
))


def q_a_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of a_pivot: a wide per-segment metrics
    frame melts to long (segment, metric, value) form, the shape metric
    stores and chart layers consume. Spark's native ``unpivot`` expands
    rows inside the same stage (no shuffle beyond the feeding aggregate);
    all measures cast to double first — unpivot requires one value type,
    and every measure here is exact in double (counts < 2^53, money via
    integer-cents sum).
    """
    c = _t(spark, sf, "customer")
    wide = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n_customers"),
        _dec_sum("c_acctbal", "total_acctbal"),
        F.min(_cents("c_acctbal")).cast("double").alias("min_acctbal_cents"),
        F.max(_cents("c_acctbal")).cast("double").alias("max_acctbal_cents"),
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["n_customers", "total_acctbal", "min_acctbal_cents", "max_acctbal_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_register(QuerySpec(
    name="a_unpivot",
    survey="extension: UNPIVOT/melt (wide metrics -> long form)",
    build=q_a_unpivot,
    oracle="""
        WITH wide AS (
          SELECT c_mktsegment,
                 CAST(COUNT(*) AS DOUBLE) AS n_customers,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
                 CAST(MIN(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   AS min_acctbal_cents,
                 CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   AS max_acctbal_cents
          FROM customer GROUP BY 1
        )
        SELECT c_mktsegment, metric, value
        FROM wide
        UNPIVOT (value FOR metric IN (n_customers, total_acctbal,
                                      min_acctbal_cents, max_acctbal_cents))
    """,
    tags=("agg", "unpivot"),
))


def q_a_time_bucket(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style time_bucket rollup: events floored to 6-hour buckets
    (arbitrary width — not limited to calendar units), per-type counts and
    value sums. Spark has no time_bucket builtin; the floor-division on
    unix micros is codegen'd and matches DuckDB's time_bucket exactly.
    """
    e = _t(spark, sf, "events")
    width_us = 6 * 3600 * 1_000_000
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / width_us) * width_us).cast("long")
    )
    return (
        e.groupBy(bucket.alias("bucket_6h"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value", "sum_value"),
        )
    )


_register(QuerySpec(
    name="a_time_bucket",
    survey="extension: hypertable time_bucket rollup",
    build=q_a_time_bucket,
    oracle="""
        SELECT time_bucket(INTERVAL 6 HOUR, ts) AS bucket_6h, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    tags=("agg", "time_bucket"),
))


def q_w_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar gap-fill + forward-fill: per-nation daily order revenue over
    a fixed quarter, with missing days materialized from a generated date
    spine, the last known revenue carried forward (LOCF), and a
    days-since-last-sale staleness counter — the time-series resample the
    reference's daily match_analytics rollup implies but Redshift cannot
    express without a calendar table
    (identity-resolution/database-schema.sql:196-229).

    Scale shape: the only full-size work is the orders scan with the date
    predicate pushed to parquet and ONE partial-aggregated exchange down to
    (nation, day) grain; the spine is generated (25 nations x 90 days, no
    stored calendar), the left join broadcasts the tiny daily aggregate,
    and the LOCF window partitions by nation — calendar-grain rows only,
    never documents. Revenue is exact (integer-cents sum, one end
    division), so forward-filled values are bit-identical cross-engine.
    """
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    start, end = "1995-01-01", "1995-03-31"
    daily = (
        orders.filter(F.to_date("o_orderdate").between(start, end))
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum("o_totalprice", "rev"),
        )
    )
    spine = nation.select(
        "n_name",
        F.explode(
            F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
        ).alias("day"),
    )
    joined = spine.join(F.broadcast(daily), ["n_name", "day"], "left")
    w = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_sale_day = F.last(
        F.when(F.col("n").isNotNull(), F.col("day")), ignorenulls=True
    ).over(w)
    return joined.select(
        "n_name",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce(F.col("rev"), F.lit(0.0)).alias("day_revenue"),
        F.coalesce(
            F.last("rev", ignorenulls=True).over(w), F.lit(0.0)
        ).alias("filled_revenue"),
        F.datediff(F.col("day"), last_sale_day).cast("long").alias("days_since_sale"),
    )


_register(QuerySpec(
    name="w_gap_fill",
    survey="extension: calendar gap-fill + LOCF forward fill (time-series resample)",
    build=q_w_gap_fill,
    oracle="""
        WITH spine AS (
          SELECT n_name, CAST(gs AS DATE) AS day
          FROM nation, generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                       INTERVAL 1 DAY) AS t(gs)
        ), daily AS (
          SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE CAST(o.o_orderdate AS DATE)
                BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
          GROUP BY 1, 2
        ), j AS (
          SELECT s.n_name, s.day, d.n, d.rev
          FROM spine s LEFT JOIN daily d USING (n_name, day)
        )
        SELECT n_name, day,
               CAST(COALESCE(n, 0) AS BIGINT) AS n_orders,
               COALESCE(rev, 0.0) AS day_revenue,
               COALESCE(last_value(rev IGNORE NULLS)
                          OVER (PARTITION BY n_name ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0.0) AS filled_revenue,
               CAST(date_diff('day',
                    last_value(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
                      OVER (PARTITION BY n_name ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                    day) AS BIGINT) AS days_since_sale
        FROM j
    """,
    tags=("window", "timeseries", "gapfill"),
))


def q_st5_capped_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization under an inactivity gap AND a hard duration cap
    (GA-style "sessions end after N hours regardless") — a running reset
    no fixed window frame expresses, folded per user in one JVM aggregate
    (see sessionize_capped). The oracle replays the fold as a recursive
    CTE stepping each user's event sequence, so the driver checks the
    stateful recurrence itself, not just summary shapes.
    """
    e = _t(spark, sf, "events")
    return sessionize_capped(e, gap_minutes=1440, cap_minutes=2880)


_register(QuerySpec(
    name="st5_capped_sessions",
    survey="ST5 extension: duration-capped sessionization (running reset)",
    build=q_st5_capped_sessions,
    oracle="""
        WITH RECURSIVE e AS (
          SELECT user_id, ts, event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ), s AS (
          SELECT user_id, rn, ts, ts AS sess_start,
                 CAST(1 AS BIGINT) AS n_sessions,
                 CAST(0 AS BIGINT) AS n_cap_splits
          FROM e WHERE rn = 1
          UNION ALL
          SELECT e.user_id, e.rn, e.ts,
                 CASE WHEN e.ts > s.ts + INTERVAL 1440 MINUTE
                        OR e.ts > s.sess_start + INTERVAL 2880 MINUTE
                      THEN e.ts ELSE s.sess_start END,
                 s.n_sessions
                   + CASE WHEN e.ts > s.ts + INTERVAL 1440 MINUTE
                            OR e.ts > s.sess_start + INTERVAL 2880 MINUTE
                          THEN 1 ELSE 0 END,
                 s.n_cap_splits
                   + CASE WHEN NOT (e.ts > s.ts + INTERVAL 1440 MINUTE)
                           AND e.ts > s.sess_start + INTERVAL 2880 MINUTE
                          THEN 1 ELSE 0 END
          FROM e JOIN s ON e.user_id = s.user_id AND e.rn = s.rn + 1
        )
        SELECT user_id,
               CAST(MAX(rn) AS BIGINT) AS n_events,
               MAX(n_sessions) AS n_sessions,
               MAX(n_cap_splits) AS n_cap_splits
        FROM s GROUP BY user_id
    """,
    tags=("streaming", "session", "stateful"),
))


def q_x_text_quantile_norm(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source score calibration: each document's quality score is
    replaced by its WITHIN-SOURCE percentile rank, making scores
    comparable across domains whose raw distributions differ (the
    quantile-normalization step before a corpus-wide quality threshold —
    a per-domain cutoff in disguise, cf. the DCLM top-fraction rule in
    x_sample_top_frac). Percentiles are integer permille,
    ((rank-1)*1000) div (n-1), computed from a total-ordered rank — no
    float division, no rounding boundary, engine-exact.

    Scale shape: one exchange on source for the rank window. A single
    giant source would skew that partition; the fix at 100 TB is
    two-pass rank (per-source counts broadcast + range-partitioned local
    rank + offset, the o_global_sequence recipe applied per group).
    """
    docs = _t(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        (quality_score("text") * 4).cast("long").alias("q4"),
    )
    w_rank = Window.partitionBy("source").orderBy("q4", "doc_id")
    w_all = Window.partitionBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w_rank))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .select(
            "doc_id",
            "source",
            "q4",
            F.expr(
                "(cast((__rn - 1) as bigint) * 1000)"
                " div greatest(cast((__n - 1) as bigint), 1)"
            ).alias("pct_permille"),
        )
    )


_register(QuerySpec(
    name="x_text_quantile_norm",
    survey="north-star: cross-source quantile normalization (score calibration)",
    build=q_x_text_quantile_norm,
    oracle="""
        WITH q AS (
          SELECT doc_id, source,
                 CAST(
                   (CASE WHEN len(list_filter(string_split_regex(lower(text),
                          '[^a-z0-9]+'), x -> x <> '')) >= 20
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN length(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g'))
                          / greatest(length(text), 1) < 0.2
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN len(list_filter(
                           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                       x -> x <> ''),
                           x -> list_contains(['the','and','of','to','a','in',
                                               'is','it','that','for'], x)))
                          / greatest(len(list_filter(string_split_regex(lower(text),
                              '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.05
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN CAST(len(list_distinct(list_filter(
                              string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> ''))) AS DOUBLE)
                          / greatest(len(list_filter(string_split_regex(lower(text),
                              '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.3
                         THEN 1 ELSE 0 END) AS BIGINT) AS q4
          FROM documents
        ), ranked AS (
          SELECT doc_id, source, q4,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY q4, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM q
        )
        SELECT doc_id, source, q4,
               CAST((rn - 1) * 1000 // greatest(n - 1, 1) AS BIGINT)
                 AS pct_permille
        FROM ranked
    """,
    tags=("text", "calibration", "quality"),
))


def q_a_hll_mergeable(spark: SparkSession, sf: str) -> DataFrame:
    """MERGEABLE distinct-count sketches — the pre-aggregation pattern
    exact COUNT(DISTINCT) cannot do: per-day HLL sketches (datasketches,
    F.hll_sketch_agg) roll up to a monthly total via hll_union_agg
    WITHOUT touching raw events again. At 100 TB this is the difference
    between storing per-partition sketch bytes and re-scanning history
    every time a coarser grain is asked for (the reference's
    match_analytics daily/hourly dual-grain cache, database-schema.sql:
    196-229, materializes both grains precisely because its COUNT
    (DISTINCT) cannot merge).

    Sketch estimates are not engine-portable, so the a_approx discipline
    applies: the query emits the EXACT count plus an in-query flag that
    the sketch estimate (daily, and the unioned month) lands within 5% —
    the oracle recomputes the exact side and asserts every flag is 1.
    """
    e = _t(spark, sf, "events")
    daily = e.groupBy(F.to_date("ts").alias("scope_date")).agg(
        F.hll_sketch_agg(F.col("user_id")).alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    ok = (
        F.abs(
            F.hll_sketch_estimate("sk").cast("double") - F.col("n_exact")
        )
        / F.col("n_exact")
        <= 0.05
    )
    per_day = daily.select(
        F.col("scope_date").cast("string").alias("scope"),
        F.col("n_exact").cast("long").alias("n_exact"),
        ok.cast("int").alias("sketch_ok"),
    )
    merged = daily.agg(
        F.hll_union_agg("sk").alias("sk_all"),
        F.sum(F.lit(0)).alias("__z"),
    )
    exact_all = e.agg(F.countDistinct("user_id").alias("n_all"))
    all_row = merged.crossJoin(F.broadcast(exact_all)).select(
        F.lit("ALL").alias("scope"),
        F.col("n_all").cast("long").alias("n_exact"),
        (
            F.abs(F.hll_sketch_estimate("sk_all").cast("double") - F.col("n_all"))
            / F.col("n_all")
            <= 0.05
        ).cast("int").alias("sketch_ok"),
    )
    return per_day.unionByName(all_row)


_register(QuerySpec(
    name="a_hll_mergeable",
    survey="A6 at scale: mergeable HLL sketch rollup (union re-aggregation)",
    build=q_a_hll_mergeable,
    oracle="""
        SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
               CAST(1 AS INT) AS sketch_ok
        FROM events GROUP BY 1
        UNION ALL
        SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), CAST(1 AS INT)
        FROM events
    """,
    tags=("agg", "sketch", "mergeable"),
))


_CMS_D = 4       # hash rows
_CMS_W = 1024    # buckets per row


def _cms_bucket(r: int, term):
    """Row-``r`` count-min bucket: md5 is the engine-shared hash (the same
    parity trick as the LSH hyperplanes), 8 hex chars -> long -> mod w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(str(r)), term)), 1, 8),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )


def q_a_cms_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch heavy hitters: token frequencies estimated from a
    d=4 x w=1024 counter grid built per SOURCE and merged by counter
    addition — the mergeable-sketch story for frequency (the companion
    to a_hll_mergeable's cardinality): at 100 TB each ingest shard keeps
    a fixed 4 KB grid, merge is elementwise +, and no shard ever holds
    the unbounded exact (term, count) table.

    Plan shape: the sketch build explodes each token row into d (row,
    bucket) pairs whose groupBy partial-combines down to <= d*w rows per
    partition BEFORE the exchange — the shuffle carries the sketch, not
    the token stream. Estimates for the exact top-k terms (the exact
    side exists only as the verification harness; production reads the
    sketch alone) come from a broadcast join of the tiny merged grid;
    estimate = min over the d rows. CMS never underestimates
    (over_estimate is a hard invariant); within_eps checks the standard
    eN/w additive bound. The oracle replays the identical construction,
    so every counter, estimate, and flag is bit-exact across engines.
    """
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "source", F.explode(tokenize(F.col("text"))).alias("term")
    )
    n_total = toks.count()  # N for the additive error bound

    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    topk = exact.orderBy(F.desc("exact_cnt"), F.asc("term")).limit(20)

    # per-source sketch -> merged sketch (elementwise counter addition)
    per_source = (
        toks.select(
            "source",
            F.posexplode(
                F.array(*[_cms_bucket(r, F.col("term")) for r in range(_CMS_D)])
            ).alias("r", "bucket"),
        )
        .groupBy("source", "r", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = per_source.groupBy("r", "bucket").agg(F.sum("c").alias("c"))

    probes = topk.select(
        "term",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(r, F.col("term")) for r in range(_CMS_D)])
        ).alias("r", "bucket"),
    )
    est = (
        probes.join(F.broadcast(merged), ["r", "bucket"])
        .groupBy("term")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("c").alias("cms_estimate"),
        )
    )
    bound = (F.lit(math.e) * F.lit(float(n_total)) / F.lit(float(_CMS_W)))
    return est.select(
        "term",
        "exact_cnt",
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") >= F.col("exact_cnt")).alias("over_estimate"),
        ((F.col("cms_estimate") - F.col("exact_cnt")).cast("double") <= bound)
        .alias("within_eps"),
    )


_register(QuerySpec(
    name="a_cms_heavy_hitters",
    survey="A6/skew at scale: mergeable count-min frequency sketch",
    build=q_a_cms_heavy_hitters,
    oracle=f"""
        WITH toks AS (
          SELECT source, unnest(list_filter(
                   string_split_regex(lower(text), '[^a-zA-Z0-9]+'),
                   x -> x <> '')) AS term
          FROM documents
        ), n AS (SELECT COUNT(*) AS n_total FROM toks),
        exact AS (
          SELECT term, COUNT(*) AS exact_cnt FROM toks GROUP BY term
        ), topk AS (
          SELECT term, exact_cnt FROM exact
          ORDER BY exact_cnt DESC, term LIMIT 20
        ), rs AS (SELECT r FROM (VALUES (0),(1),(2),(3)) t(r)),
        per_source AS (
          SELECT source, r,
                 CAST('0x' || substr(md5(CAST(r AS VARCHAR) || '|' || term), 1, 8)
                      AS BIGINT) % {_CMS_W} AS bucket,
                 COUNT(*) AS c
          FROM toks, rs GROUP BY 1, 2, 3
        ), merged AS (
          SELECT r, bucket, SUM(c) AS c FROM per_source GROUP BY 1, 2
        ), probes AS (
          SELECT t.term, t.exact_cnt, rs.r,
                 CAST('0x' || substr(md5(CAST(rs.r AS VARCHAR) || '|' || t.term), 1, 8)
                      AS BIGINT) % {_CMS_W} AS bucket
          FROM topk t, rs
        )
        SELECT p.term,
               CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
               CAST(MIN(m.c) AS BIGINT) AS cms_estimate,
               MIN(m.c) >= p.exact_cnt AS over_estimate,
               CAST(MIN(m.c) - p.exact_cnt AS DOUBLE)
                 <= 2.718281828459045 * (SELECT n_total FROM n) / {_CMS_W}
                 AS within_eps
        FROM probes p JOIN merged m ON m.r = p.r AND m.bucket = p.bucket
        GROUP BY p.term, p.exact_cnt
    """,
    tags=("agg", "sketch", "mergeable", "heavy-hitters"),
))


_HIST_W = 1024  # fixed histogram bins


def q_a_hist_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles + exact in-bin selection —
    the quantile member of the mergeable-sketch trio (a_hll_mergeable =
    cardinality, a_cms_heavy_hitters = frequency): each shard keeps a
    fixed 1024-counter histogram over integer cents, merge is counter
    addition, and a p-quantile estimate falls out of the merged
    cumulative — with a HARD containment invariant (the exact value
    provably lies inside the selected bin).

    The exact side demonstrates distributed exact selection: the
    histogram narrows the k-th smallest to ONE bin, so the full sort
    collapses to ranking only that bin's rows (~N/1024) — the two-pass
    quantile algorithm, not a global single-partition sort. All bin
    math is integer (floor-div against the closed [lo, hi] range), so
    every boundary is bit-exact across engines.
    """
    o = _t(spark, sf, "orders")
    base = o.select(
        _cents("o_totalprice").alias("__c"),
        F.col("o_orderpriority").alias("shard"),
    )
    lo, hi, n_total = base.agg(
        F.min("__c"), F.max("__c"), F.count(F.lit(1))
    ).first()
    rng = hi - lo + 1
    bin_expr = F.expr(
        f"least(((__c - {lo}) * {_HIST_W}) div {rng}, {_HIST_W - 1})"
    ).alias("bin")

    per_shard = (
        base.select("shard", bin_expr)
        .groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    merged = per_shard.groupBy("bin").agg(F.sum("c").alias("cnt"))
    # 1024-row reduced-grain frame: the cumulative runs on the sketch,
    # never on the data (whitelisted in the single-partition plan guard)
    hist = merged.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bin"))
    )

    qs = spark.createDataFrame(
        [(p, (p * n_total + 99) // 100) for p in (50, 90, 99)],
        "p int, k long",
    )
    tgt = (
        qs.join(F.broadcast(hist), F.col("cum") >= F.col("k"))
        .groupBy("p", "k")
        .agg(F.min("bin").alias("bin"))
        .join(F.broadcast(hist), "bin")
        .select("p", "k", "bin", (F.col("cum") - F.col("cnt")).alias("cum_before"))
    )
    # exact in-bin selection: only target-bin rows rank (broadcast the
    # 3-row target frame onto the binned fact side, window per quantile)
    in_bin = base.select("__c", bin_expr).join(F.broadcast(tgt), "bin")
    ranked = in_bin.withColumn(
        "rn", F.row_number().over(Window.partitionBy("p").orderBy("__c"))
    ).filter(F.col("rn") == F.col("k") - F.col("cum_before"))
    return ranked.select(
        F.col("p").alias("percent"),
        F.lit(n_total).cast("long").alias("n"),
        (F.lit(lo) + F.expr(f"(bin * {rng}) div {_HIST_W}")).cast("long").alias("est_lo_cents"),
        (F.lit(lo) + F.expr(f"((bin + 1) * {rng}) div {_HIST_W}") - 1).cast("long").alias("est_hi_cents"),
        F.col("__c").cast("long").alias("exact_cents"),
        ((F.col("__c") >= F.lit(lo) + F.expr(f"(bin * {rng}) div {_HIST_W}"))
         & (F.col("__c") <= F.lit(lo) + F.expr(f"((bin + 1) * {rng}) div {_HIST_W}") - 1)
         ).alias("within_bin"),
    )


_register(QuerySpec(
    name="a_hist_quantiles",
    survey="A9 at scale: mergeable histogram quantile sketch + exact two-pass selection",
    build=q_a_hist_quantiles,
    oracle=f"""
        WITH base AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderpriority AS shard
          FROM orders
        ), b AS (
          SELECT MIN(c) AS lo, MAX(c) AS hi, COUNT(*) AS n,
                 MAX(c) - MIN(c) + 1 AS rng
          FROM base
        ), binned AS (
          SELECT shard, c,
                 least(((c - (SELECT lo FROM b)) * {_HIST_W})
                         // (SELECT rng FROM b), {_HIST_W - 1}) AS bin
          FROM base
        ), per_shard AS (
          SELECT shard, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2
        ), merged AS (
          SELECT bin, SUM(c) AS cnt FROM per_shard GROUP BY 1
        ), hist AS (
          SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM merged
        ), qs AS (
          SELECT p, (p * (SELECT n FROM b) + 99) // 100 AS k
          FROM (VALUES (50), (90), (99)) t(p)
        ), tgt AS (
          SELECT q.p, q.k, MIN(h.bin) AS bin
          FROM qs q JOIN hist h ON h.cum >= q.k
          GROUP BY 1, 2
        ), tgt2 AS (
          SELECT t.p, t.k, t.bin, h.cum - h.cnt AS cum_before
          FROM tgt t JOIN hist h ON h.bin = t.bin
        ), ranked AS (
          SELECT t.p, t.k, t.bin, t.cum_before, bb.c,
                 ROW_NUMBER() OVER (PARTITION BY t.p ORDER BY bb.c) AS rn
          FROM tgt2 t JOIN binned bb ON bb.bin = t.bin
        )
        SELECT CAST(p AS INT) AS percent,
               CAST((SELECT n FROM b) AS BIGINT) AS n,
               CAST((SELECT lo FROM b) + (bin * (SELECT rng FROM b)) // {_HIST_W}
                    AS BIGINT) AS est_lo_cents,
               CAST((SELECT lo FROM b) + ((bin + 1) * (SELECT rng FROM b)) // {_HIST_W} - 1
                    AS BIGINT) AS est_hi_cents,
               CAST(c AS BIGINT) AS exact_cents,
               c >= (SELECT lo FROM b) + (bin * (SELECT rng FROM b)) // {_HIST_W}
                 AND c <= (SELECT lo FROM b) + ((bin + 1) * (SELECT rng FROM b)) // {_HIST_W} - 1
                 AS within_bin
        FROM ranked WHERE rn = k - cum_before
    """,
    tags=("agg", "sketch", "mergeable", "quantile"),
))


def q_p_rate_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Rate-limit audit — the batch twin of the reference's express-rate-
    limit middleware (100 requests / 15-min fixed window per IP,
    identity-resolution/api-server.js:60-68): events bucket into fixed
    15-minute windows per user; windows over the limit report how many
    events a live limiter would have rejected. Fixture traffic is sparse,
    so the demo limit is 3/window (the operator is limit-parametric); the
    aggregation is one partial-combined exchange on (user, window), the
    same shape at any limit.
    """
    e = _t(spark, sf, "events")
    width_us = 15 * 60 * 1_000_000
    limit = 3
    bucket = F.timestamp_micros(
        (F.floor(F.unix_micros("ts") / width_us) * width_us).cast("long")
    )
    return (
        e.groupBy("user_id", bucket.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") > limit)
        .select(
            "user_id",
            "window_start",
            "n_events",
            (F.col("n_events") - limit).cast("long").alias("n_rejected"),
        )
    )


_register(QuerySpec(
    name="p_rate_limit",
    survey="S10 hardening: rate-limit audit (api-server.js:60-68 batch twin)",
    build=q_p_rate_limit,
    oracle="""
        SELECT user_id, time_bucket(INTERVAL 15 MINUTE, ts) AS window_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) - 3 AS BIGINT) AS n_rejected
        FROM events
        GROUP BY 1, 2
        HAVING COUNT(*) > 3
    """,
    tags=("filter", "rate-limit", "audit"),
))


def q_a_funnel_ordered(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered conversion funnel (signup -> view -> purchase, strictly in
    event-time order per user) — the CDP behavioral query the reference's
    marketing views feed. One shuffle: events collect per user
    (sort_array inside the agg), then a zero-shuffle integer fold walks
    the sequence advancing a stage counter only when the NEXT stage's
    event appears; a final single-row aggregate counts users per depth.
    All-integer state, so bit-exact cross-engine.
    """
    e = _t(spark, sf, "events")
    code = (
        F.when(F.col("event_type") == "signup", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 3)
        .otherwise(0)
    )
    per_user = (
        e.select("user_id", F.struct("ts", code.alias("code")).alias("s"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("seq"))
        .select(
            "user_id",
            F.aggregate(
                F.col("seq"),
                F.lit(0),
                lambda acc, x: F.when(
                    x["code"] == acc + 1, acc + 1
                ).otherwise(acc),
            ).alias("depth"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum((F.col("depth") >= 1).cast("long")).alias("n_signup"),
        F.sum((F.col("depth") >= 2).cast("long")).alias("n_signup_view"),
        F.sum((F.col("depth") >= 3).cast("long")).alias("n_full_funnel"),
    )


_register(QuerySpec(
    name="a_funnel_ordered",
    survey="extension: ordered conversion funnel (behavioral analytics)",
    build=q_a_funnel_ordered,
    oracle="""
        WITH seq AS (
          SELECT user_id,
                 list(CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
                      WHEN 'purchase' THEN 3 ELSE 0 END
                      ORDER BY ts, CASE event_type WHEN 'signup' THEN 1
                      WHEN 'view' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END
                     ) AS codes
          FROM events GROUP BY user_id
        ), depth AS (
          SELECT user_id,
                 list_reduce(list_prepend(0, codes),
                   (acc, x) -> CASE WHEN x = acc + 1 THEN acc + 1
                               ELSE acc END) AS d
          FROM seq
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN d >= 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_signup,
               CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_signup_view,
               CAST(SUM(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_full_funnel
        FROM depth
    """,
    tags=("agg", "funnel", "behavioral"),
))


def q_a_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Event-transition matrix (first-order Markov view of the event
    stream): for each (prev_type, next_type) consecutive pair per user,
    the transition count and conditional probability. Same one-exchange
    shape as the funnel: events collect per user sorted by (ts, event_id)
    — the unique id is the tiebreaker that keeps tied timestamps
    deterministic across engines — consecutive pairs come from a
    zero-shuffle zip_with of the sequence against its own tail, and the
    probability normalizes over a ~|event_types|-row aggregate.
    """
    e = _t(spark, sf, "events")
    per_user = (
        e.select(
            "user_id",
            F.struct(
                "ts",
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("et"),
            ).alias("s"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list("s")).alias("seq"))
    )
    pairs = per_user.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("seq"), 1, F.size("seq") - 1),
                F.slice(F.col("seq"), 2, F.size("seq") - 1),
                lambda a, b: F.struct(
                    a["et"].alias("prev_type"), b["et"].alias("next_type")
                ),
            )
        ).alias("p")
    ).select("p.prev_type", "p.next_type")
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(w), 4
        ).alias("p_transition"),
    )


_register(QuerySpec(
    name="a_event_transitions",
    survey="beyond-reference: behavioral transition matrix (Markov)",
    build=q_a_event_transitions,
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type AS et,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
        ), c AS (
          SELECT et AS prev_type, nxt AS next_type,
                 CAST(COUNT(*) AS BIGINT) AS n_transitions
          FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n_transitions,
               ROUND(n_transitions / SUM(n_transitions)
                       OVER (PARTITION BY prev_type), 4) AS p_transition
        FROM c
    """,
    tags=("agg", "behavioral", "markov"),
))


def q_a_attribution_decay(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-touch time-decay attribution (the CDP companion to J6/A8's
    last-touch funnel): every purchase distributes credit across the
    user's preceding touches in a 30-day lookback, weighted 2^(-age_days).
    Weights are INTEGER 2^(30 - age) (scaled by 2^30), so per-type weight
    sums are exact and the only float op is one final division rounded to
    4 dp — bit-stable across engines, unlike summing decayed floats whose
    addition order differs. Plan: one equi-join on user_id (the range
    predicate filters the per-user fan-out, never a cartesian), one
    (purchase, touch_type) aggregate, and a tiny per-purchase total via a
    second aggregation joined back.
    """
    e = _t(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    touches = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = (
        purchases.join(touches, "user_id")
        .filter(
            (F.col("t_ts") < F.col("p_ts"))
            & (F.datediff(F.to_date("p_ts"), F.to_date("t_ts")) <= 30)
        )
        .select(
            "purchase_id",
            "touch_type",
            F.expr(
                "shiftleft(cast(1 as bigint),"
                " 30 - datediff(to_date(p_ts), to_date(t_ts)))"
            ).alias("w"),
        )
    )
    by_type = pairs.groupBy("purchase_id", "touch_type").agg(
        F.sum("w").alias("w_sum"), F.count(F.lit(1)).alias("n_touches")
    )
    totals = by_type.groupBy("purchase_id").agg(
        F.sum("w_sum").alias("w_total")
    )
    return by_type.join(totals, "purchase_id").select(
        "purchase_id",
        "touch_type",
        "n_touches",
        "w_sum",
        F.round(F.col("w_sum") / F.col("w_total"), 4).alias("credit_share"),
    )


_register(QuerySpec(
    name="a_attribution_decay",
    survey="beyond-reference: multi-touch time-decay attribution (J6/A8 companion)",
    build=q_a_attribution_decay,
    oracle="""
        WITH pairs AS (
          SELECT p.event_id AS purchase_id, t.event_type AS touch_type,
                 (CAST(1 AS BIGINT) <<
                  (30 - date_diff('day', CAST(t.ts AS DATE),
                                  CAST(p.ts AS DATE)))) AS w
          FROM events p JOIN events t USING (user_id)
          WHERE p.event_type = 'purchase'
            AND t.event_type <> 'purchase'
            AND t.ts < p.ts
            AND date_diff('day', CAST(t.ts AS DATE), CAST(p.ts AS DATE)) <= 30
        ), by_type AS (
          SELECT purchase_id, touch_type,
                 CAST(SUM(w) AS BIGINT) AS w_sum,
                 CAST(COUNT(*) AS BIGINT) AS n_touches
          FROM pairs GROUP BY 1, 2
        ), totals AS (
          SELECT purchase_id, SUM(w_sum) AS w_total FROM by_type GROUP BY 1
        )
        SELECT b.purchase_id, b.touch_type, b.n_touches, b.w_sum,
               ROUND(b.w_sum / t.w_total, 4) AS credit_share
        FROM by_type b JOIN totals t USING (purchase_id)
    """,
    tags=("agg", "attribution", "behavioral"),
))


def q_a_ltv_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """Customer LTV decile segmentation (the marketing decile report the
    reference's segments gesture at): customers ranked by lifetime spend
    into NTILE(10) with a deterministic (spend desc, custkey asc) total
    order, then per-decile counts and exact-cents totals. The NTILE
    window is a single total order — but over the CUSTOMER-GRAIN
    aggregate, orders of magnitude under the fact corpus (one long + one
    key per customer crosses the exchange). At extreme customer
    cardinality (1e9+), swap the NTILE for decile THRESHOLDS from one
    percentile aggregate and assign by comparison — same report, no total
    order, at the cost of value-tie boundary splits differing from
    NTILE's equal-count contract.
    """
    o = _t(spark, sf, "orders")
    ltv = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("__cents")
    )
    w = Window.orderBy(F.col("__cents").desc(), F.col("o_custkey").asc())
    dec = ltv.withColumn("decile", F.ntile(10).over(w))
    return dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("__cents").cast("double") / 100.0).alias("total_ltv"),
        (F.min("__cents").cast("double") / 100.0).alias("min_ltv"),
    )


_register(QuerySpec(
    name="a_ltv_deciles",
    survey="beyond-reference: LTV decile segmentation (NTILE)",
    build=q_a_ltv_deciles,
    oracle="""
        WITH ltv AS (
          SELECT o_custkey,
                 SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY 1
        ), dec AS (
          SELECT o_custkey, cents,
                 NTILE(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS decile
          FROM ltv
        )
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_ltv,
               CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_ltv
        FROM dec GROUP BY decile
    """,
    tags=("agg", "window", "segmentation"),
))


def q_a_metric_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Metric anomaly flags over the daily order count: a day is anomalous
    when it sits more than 3 trailing-window standard deviations from the
    trailing 7-day mean. The z-test is INTEGER algebra end to end —
    (7x - s)^2 > 9 * (7*ss - s^2) with s/ss the trailing sum and
    sum-of-squares — so the flag is bit-exact in any engine; no float
    mean/stddev ever materializes. One aggregate to the daily grain, then
    one calendar-grain window (single partition by design: the frame is
    over ~dates, not rows).
    """
    o = _t(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    x = F.col("n_orders")
    s = F.sum("n_orders").over(w)
    ss = F.sum(x * x).over(w)
    k = F.count(F.lit(1)).over(w)
    lhs = (F.lit(7) * x - s) * (F.lit(7) * x - s)
    rhs = F.lit(9) * (F.lit(7) * ss - s * s)
    return (
        daily.select(
            "day",
            "n_orders",
            k.alias("__k"),
            s.alias("trailing_sum"),
            (lhs > rhs).cast("int").alias("is_anomaly"),
        )
        .filter(F.col("__k") == 7)
        .drop("__k")
    )


_register(QuerySpec(
    name="a_metric_anomaly",
    survey="beyond-reference: trailing-window metric anomaly flags (exact integer z-test)",
    build=q_a_metric_anomaly,
    oracle="""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        ), win AS (
          SELECT day, n_orders,
                 SUM(n_orders) OVER w AS s,
                 SUM(n_orders * n_orders) OVER w AS ss,
                 COUNT(*) OVER w AS k
          FROM daily
          WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
        )
        SELECT day, n_orders, CAST(s AS BIGINT) AS trailing_sum,
               CAST((7 * n_orders - s) * (7 * n_orders - s)
                    > 9 * (7 * ss - s * s) AS INT) AS is_anomaly
        FROM win WHERE k = 7
    """,
    tags=("agg", "anomaly", "window"),
))


def q_a_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-signup week, counted
    distinct in each subsequent activity week. First-touch is one
    partial-aggregated groupBy on user; the activity join reuses that
    partitioning; the final (cohort, week-offset) rollup is an exact
    COUNT(DISTINCT) over a bounded key space. Week offsets are integer
    day-diffs floor-divided by 7 — exact cross-engine.
    """
    e = _t(spark, sf, "events")
    first = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", F.col("t0"))).alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("t0")) / 7
            ).cast("int").alias("week_offset"),
        )
        .filter(F.col("week_offset") >= 0)
    )
    return act.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active_users")
    )


_register(QuerySpec(
    name="a_retention_cohorts",
    survey="extension: weekly retention cohort analysis",
    build=q_a_retention_cohorts,
    oracle="""
        WITH first AS (
          SELECT user_id, MIN(ts) AS t0 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ), act AS (
          SELECT e.user_id,
                 CAST(date_trunc('week', f.t0) AS DATE) AS cohort_week,
                 CAST(date_diff('day', CAST(f.t0 AS DATE), CAST(e.ts AS DATE))
                      // 7 AS INT) AS week_offset
          FROM events e JOIN first f USING (user_id)
        )
        SELECT cohort_week, week_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
        FROM act WHERE week_offset >= 0
        GROUP BY 1, 2
    """,
    tags=("agg", "retention", "behavioral"),
))


def q_x_text_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index build: sorted posting list + document frequency per
    term, for terms with df in [2, 400]. The df filter runs BEFORE list
    collection — document frequencies aggregate first (partial-combined
    longs), stopword-grade terms are dropped, and only surviving terms
    collect postings. Both aggregations and the join hash-partition on
    term, so the whole build is one exchange of (term, id) pairs; no
    unbounded collect_list for hot terms ever materializes. Postings are
    rendered to a comma-joined string (catalog determinism rule: array
    outputs are strings with an explicit element order).
    """
    docs = _t(spark, sf, "documents")
    terms = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        F.explode(F.array_distinct(tokenize("text"))).alias("term"),
    )
    kept = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= 400))
    )
    return (
        terms.join(kept, "term")
        .groupBy("term", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
    )


_register(QuerySpec(
    name="x_text_postings",
    survey="north-star: inverted-index posting lists (df-bounded)",
    build=q_x_text_postings,
    oracle="""
        WITH t AS (
          SELECT DISTINCT CAST(doc_id AS BIGINT) AS id, tok AS term
          FROM documents,
               UNNEST(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS u(tok)
        ), kept AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df
          FROM t GROUP BY term
          HAVING COUNT(*) BETWEEN 2 AND 400
        )
        SELECT t.term, kept.df,
               array_to_string(list(t.id ORDER BY t.id), ',') AS postings
        FROM t JOIN kept USING (term)
        GROUP BY t.term, kept.df
    """,
    tags=("text", "index"),
))


def q_x_corpus_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card length histogram: doc counts per (lang, 100-char bin).
    Pure integer floor-division binning fused into the scan; one bounded
    aggregation (langs × bins keys).
    """
    docs = _t(spark, sf, "documents")
    return docs.groupBy(
        "lang",
        (F.floor(F.col("n_chars") / 100) * 100).cast("long").alias("len_bin"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))


_register(QuerySpec(
    name="x_corpus_histogram",
    survey="north-star: dataset-card length histogram",
    build=q_x_corpus_histogram,
    oracle="""
        SELECT lang, CAST(n_chars // 100 * 100 AS BIGINT) AS len_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1, 2
    """,
    tags=("text", "stats", "histogram"),
))


def q_x_corpus_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card length quantiles: exact p50/p90/p99 doc length per
    language, rank-selected (value at ``rn == ceil(q * n)``) rather than
    interpolated — pure integer/ordering logic, so both engines agree
    bit-for-bit (float interpolation orders differ across engines).
    Plan: one hash exchange on lang for the window; the conditional
    aggregate reuses that partitioning (no second exchange). At 100 TB a
    per-lang total sort is the exact-answer cost — swap the window for
    ``approx_percentile`` (t-digest, partial-aggregated, no sort) when
    rank-exact quantiles are not required; this entry is the exact,
    oracle-checkable variant.
    """
    docs = _t(spark, sf, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    ranked = docs.select(
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )

    def _pick(q: float) -> "F.Column":
        return F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * q), F.col("n_chars"))
        )

    return ranked.groupBy("lang").agg(
        _pick(0.5).alias("p50_chars"),
        _pick(0.9).alias("p90_chars"),
        _pick(0.99).alias("p99_chars"),
        F.max("n").alias("n_docs"),
    )


_register(QuerySpec(
    name="x_corpus_quantiles",
    survey="north-star: dataset-card length quantiles (rank-exact)",
    build=q_x_corpus_quantiles,
    oracle="""
        WITH ranked AS (
          SELECT lang, CAST(n_chars AS BIGINT) AS n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT lang,
               MAX(CASE WHEN rn = CEIL(n * 0.5)  THEN n_chars END) AS p50_chars,
               MAX(CASE WHEN rn = CEIL(n * 0.9)  THEN n_chars END) AS p90_chars,
               MAX(CASE WHEN rn = CEIL(n * 0.99) THEN n_chars END) AS p99_chars,
               CAST(MAX(n) AS BIGINT) AS n_docs
        FROM ranked GROUP BY lang
    """,
    tags=("text", "stats", "quantiles"),
))


def q_x_text_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking: 64-token windows every 48 tokens (16-token
    overlap). Zero shuffles — all array expressions fused into the scan,
    chunks emitted as digests not text.
    """
    docs = _t(spark, sf, "documents")
    out = chunk_tokens(docs, "doc_id", "text", chunk_size=64, stride=48)
    return out.select(
        F.col("id").alias("doc_id"), "chunk_idx", "n_tokens", "chunk_hash"
    )


_register(QuerySpec(
    name="x_text_chunking",
    survey="north-star: context-window chunking with overlap",
    build=q_x_text_chunking,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        )
        SELECT doc_id,
               CAST(u.s // 48 AS BIGINT) AS chunk_idx,
               CAST(len(toks[u.s + 1 : u.s + 64]) AS BIGINT) AS n_tokens,
               md5(array_to_string(toks[u.s + 1 : u.s + 64], ' ')) AS chunk_hash
        FROM tk, UNNEST(range(0, len(toks), 48)) AS u(s)
    """,
    tags=("text", "chunking"),
))


def q_scale_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe two-stage aggregation: hot group keys fan out over a
    deterministic hash salt, partials re-aggregate by key. Result must be
    exactly the plain GROUP BY (sums are algebraic) — which is what the
    oracle checks.
    """
    li = _t(spark, sf, "lineitem").withColumn(
        "l_quantity", _cents("l_quantity")  # exact integer cents, see _dec_sum
    )
    out = salted_groupby_sum(li, ["l_returnflag"], ["l_quantity"], n_salts=16)
    return out.select(
        "l_returnflag",
        (F.col("sum_l_quantity").cast("double") / 100.0).alias("sum_qty"),
    )


_register(QuerySpec(
    name="scale_salted_agg",
    survey="scale: deterministic skew salting",
    build=q_scale_salted_agg,
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    tags=("scale", "skew"),
))


def q_scale_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Key-skew diagnosis over lineitem's supplier key: the top-20
    heaviest keys with exact counts and corpus share — the report that
    decides when a join/agg key needs the salting path
    (scale_salted_agg / salted_join). One exchange of (key, count)
    partials; top-k via TakeOrderedAndProject; total via a one-row
    broadcast.
    """
    li = _t(spark, sf, "lineitem")
    return skew_report(li, ("l_suppkey",), top_k=20)


_register(QuerySpec(
    name="scale_skew_report",
    survey="beyond-reference: join-key skew diagnosis (salting decision input)",
    build=q_scale_skew_report,
    oracle="""
        WITH counts AS (
          SELECT CAST(l_suppkey AS VARCHAR) AS key,
                 CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM lineitem GROUP BY 1
        ), tot AS (
          SELECT SUM(n_rows) AS t FROM counts
        )
        SELECT key, n_rows,
               ROUND(n_rows / (SELECT t FROM tot), 6) AS share
        FROM counts ORDER BY n_rows DESC, key ASC LIMIT 20
    """,
    tags=("scale", "skew", "diagnosis"),
))


def q_scale_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    """Bucketed co-located join — Spark's answer to the reference's
    DISTSTYLE/SORTKEY physical layout (sql/redshift_table_schemas.sql:
    114-115, 314-325): pay the shuffle ONCE at write time, then every join
    and aggregation on the bucket key runs with zero exchanges.

    Orders and customers are bucket-written on custkey, sort-merge-joined
    (broadcast pinned off — at 100 TB neither side broadcasts), and
    aggregated per custkey. The zero-exchange property is DRIVER-CHECKED,
    not just pytest-asserted: the physical plan's Exchange count rides in
    the output as ``plan_exchanges`` and the oracle asserts it is 0.
    """
    tag = os.path.basename(sf.rstrip("/")).replace(".", "_")
    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    t_o, t_c = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    write_bucketed(o, t_o, ["custkey"], n_buckets=8, sort_cols=["custkey"],
                   path=_scratch(sf, t_o))
    write_bucketed(c, t_c, ["custkey"], n_buckets=8, sort_cols=["custkey"],
                   path=_scratch(sf, t_c))
    joined = bucketed_join(spark, t_o, t_c, ["custkey"], force_sort_merge=True)
    agg = joined.groupBy("custkey").agg(
        F.max("c_mktsegment").alias("mktsegment"),
        F.count(F.lit(1)).alias("n_orders"),
        _dec_sum("o_totalprice", "sum_price"),
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    return agg.withColumn(
        "plan_exchanges", F.lit(plan.count("Exchange")).cast("int")
    )


_register(QuerySpec(
    name="scale_bucketed_join",
    survey="scale: bucketed co-located join (DISTSTYLE/SORTKEY parity)",
    build=q_scale_bucketed_join,
    oracle="""
        SELECT o.o_custkey AS custkey,
               MAX(c.c_mktsegment) AS mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price,
               CAST(0 AS INT) AS plan_exchanges
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY o.o_custkey
    """,
    tags=("scale", "bucketing"),
))


def q_scale_bloom_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Broadcast hash-bucket prefilter semi join (the runtime-filter /
    bloom-join pattern, one hash function): the key side collapses to
    DISTINCT xxhash64(key)%2^20 buckets — bounded at ~8 MB no matter how
    many keys — which broadcast-filters the fact scan so only bucket-hit
    rows (true matches + occupancy-rate false positives) reach the exact
    semi join's shuffle. Reference parity: the processed-leads NOT IN guard
    (lead-processor/index.js:208-214) whose naive plan shuffles the whole
    fact table at 100 TB.

    The result is exactly the plain semi join (the oracle), and the
    prefilter shape is DRIVER-CHECKED: plan_prefilter_bcast rides in the
    output as 1 only if the plan broadcast-joins without a cartesian.
    """
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    keys = _t(spark, sf, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    out = hash_prefilter_join(
        li, keys, "l_orderkey", "o_orderkey", how="left_semi", n_buckets=1 << 20
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    ok = "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
    return out.withColumn("plan_prefilter_bcast", F.lit(1 if ok else 0).cast("int"))


_register(QuerySpec(
    name="scale_bloom_prune",
    survey="scale: broadcast hash-bucket prefilter (runtime-filter/bloom join)",
    build=q_scale_bloom_prune,
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(1 AS INT) AS plan_prefilter_bcast
        FROM lineitem
        WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000)
    """,
    tags=("scale", "bloom", "semi-join"),
))


def q_scale_dpp_prune(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition pruning (DPP): the fact lake is hive-partitioned
    by order month; the query joins it to a stored month-dimension filtered
    on an ATTRIBUTE (quarter), so the surviving partition values are only
    knowable at runtime — a literal month list would constant-fold into
    static pruning and prove nothing. Spark inserts a
    dynamicpruningexpression subquery on the fact scan that reuses the
    dimension's broadcast to skip non-matching partitions before reading
    them — the mechanism that turns a 100 TB star-join scan into reading
    only the quarter actually joined. The plan shape is DRIVER-CHECKED:
    plan_dpp rides in the output as 1 only when the executed plan contains
    the runtime pruning subquery.
    """
    lake = _scratch(sf, "orders_dpp_lake")
    dim_path = _scratch(sf, "month_dim")
    orders = _t(spark, sf, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    orders.select("o_orderkey", "o_totalprice", month).write.mode(
        "overwrite"
    ).partitionBy("order_month").parquet(lake)
    (
        orders.select(month)
        .distinct()
        .withColumn(
            "quarter",
            F.concat(
                F.substring("order_month", 1, 4),
                F.lit("Q"),
                F.expr("(cast(substring(order_month, 6, 2) as int) + 2) div 3"),
            ),
        )
        .write.mode("overwrite")
        .parquet(dim_path)
    )
    fact = read_lake(spark, lake)
    dim = spark.read.parquet(dim_path).filter(F.col("quarter") == "1995Q1")
    out = (
        fact.join(F.broadcast(dim), "order_month")
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice", "revenue"),
        )
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    ok = "dynamicpruning" in plan.lower()
    return out.withColumn("plan_dpp", F.lit(1 if ok else 0).cast("int"))


_register(QuerySpec(
    name="scale_dpp_prune",
    survey="scale: dynamic partition pruning on a star join",
    build=q_scale_dpp_prune,
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(1 AS INT) AS plan_dpp
        FROM orders
        WHERE strftime(o_orderdate, '%Y-%m') IN ('1995-01', '1995-02', '1995-03')
        GROUP BY 1
    """,
    tags=("scale", "dpp", "pruning"),
))


def q_scale_sorted_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Range-sorted lake layout (Redshift compound-SORTKEY parity,
    sql/redshift_table_schemas.sql:314-325): orders written
    repartitionByRange+sortWithinPartitions on o_orderdate, then scanned
    with a one-year range predicate. Because each file/row-group covers a
    disjoint date range, the pushed-down predicate skips most of the table
    at the scan — the 100 TB win this layout exists for.

    Both properties are DRIVER-CHECKED: the rows equal filtering the
    original table (the oracle), and plan_pushdown rides as 1 only if the
    range predicate reached the parquet scan (PushedFilters non-empty).
    """
    out_path = _scratch(sf, "orders_sorted")
    orders = _t(spark, sf, "orders")
    write_range_sorted(orders, out_path, ["o_orderdate"], n_files=8)
    lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-01-01 00:00:00").cast("timestamp")
    scan = spark.read.parquet(out_path).filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    sel = scan.select("o_orderkey", "o_custkey", "o_totalprice")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    pushed = "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    return sel.withColumn("plan_pushdown", F.lit(1 if pushed else 0).cast("int"))


_register(QuerySpec(
    name="scale_sorted_layout",
    survey="scale: range-sorted lake layout (compound SORTKEY parity)",
    build=q_scale_sorted_layout,
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(1 AS INT) AS plan_pushdown
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
    """,
    tags=("scale", "layout", "pushdown"),
))


def q_x_text_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — raw tf, unsmoothed ln(N/df) idf,
    three-shuffle shape (tf groupBy, df window over term, top-k window
    over id).
    """
    docs = _t(spark, sf, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=5)


_register(QuerySpec(
    name="x_text_tfidf",
    survey="north-star: TF-IDF term scoring",
    bench=True,
    build=q_x_text_tfidf,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), scored AS (
          SELECT id, term,
                 ROUND(tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                               / COUNT(*) OVER (PARTITION BY term)), 4) AS tfidf
          FROM tf
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY tfidf DESC, term ASC) AS rn
          FROM scored
        )
        SELECT id, term, tfidf FROM ranked WHERE rn <= 5
    """,
    tags=("text", "tfidf"),
))


def q_x_text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style duplicate-trigram repetition signal per document —
    the standard pretraining filter for boilerplate/spam (fraction of
    n-grams that repeat an earlier one). Zero shuffles: n-grams are built
    with JVM higher-order functions inside the scan stage; rep_ratio is
    one IEEE division of exact ints, so it hashes identically in DuckDB.
    """
    docs = _t(spark, sf, "documents")
    n_grams, n_distinct, ratio = ngram_repetition(F.col("text"), n=3)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_grams.cast("int").alias("n_grams"),
        n_distinct.cast("int").alias("n_distinct"),
        ratio.alias("rep_ratio"),
    )


_register(QuerySpec(
    name="x_text_repetition",
    survey="north-star: text quality scoring (duplicate n-gram repetition)",
    build=q_x_text_repetition,
    oracle="""
        WITH t AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), g AS (
          SELECT doc_id, len(toks) - 2 AS cnt,
                 CASE WHEN len(toks) >= 3 THEN
                   list_transform(generate_series(1, len(toks) - 2),
                                  i -> array_to_string(toks[i:i+2], ' '))
                 ELSE [] END AS grams
          FROM t
        )
        SELECT doc_id,
               CAST(CASE WHEN cnt > 0 THEN cnt ELSE 0 END AS INT) AS n_grams,
               CAST(CASE WHEN cnt > 0 THEN len(list_distinct(grams))
                    ELSE 0 END AS INT) AS n_distinct,
               CASE WHEN cnt > 0 THEN
                 CAST(cnt - len(list_distinct(grams)) AS DOUBLE) / cnt
               ELSE 0.0 END AS rep_ratio
        FROM g
    """,
    tags=("text", "quality", "repetition"),
))


def q_x_text_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document unigram Shannon entropy plus token/type counts — a
    repetition/boilerplate quality signal, computed row-locally (zero
    shuffles; the fold order is pinned by sorting the distinct terms).
    """
    docs = _t(spark, sf, "documents")
    toks = tokenize(F.col("text"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_types"),
        F.round(unigram_entropy("text"), 4).alias("entropy_bits"),
    )


_register(QuerySpec(
    name="x_text_entropy",
    survey="north-star: text quality scoring (entropy)",
    build=q_x_text_entropy,
    oracle="""
        WITH t AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents
        ), c AS (
          SELECT doc_id, len(toks) AS n,
                 list_transform(list_sort(list_distinct(toks)),
                                tt -> len(list_filter(toks, x -> x = tt))) AS counts
          FROM t
        )
        SELECT doc_id,
               CAST(n AS INT) AS n_tokens,
               CAST(len(counts) AS INT) AS n_types,
               CASE WHEN n = 0 THEN 0.0 ELSE ROUND(
                 list_reduce(
                   list_prepend(0.0,
                     list_transform(counts,
                       cc -> -(cc / CAST(n AS DOUBLE))
                             * log2(cc / CAST(n AS DOUBLE)))),
                   (a, b) -> a + b), 4) END AS entropy_bits
        FROM c
    """,
    tags=("text", "quality"),
))


def q_x_sample_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by md5 hash bucket —
    content-addressed (re-runs and appends never reassign existing docs),
    zero-shuffle (one projected expression fused into the scan).
    """
    docs = _t(spark, sf, "documents")
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "split")


_register(QuerySpec(
    name="x_sample_split",
    survey="north-star: deterministic train/val/test splitting",
    build=q_x_sample_split,
    oracle="""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE
                 WHEN b < 8000 THEN 'train'
                 WHEN b < 9000 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM (
          SELECT doc_id,
                 CAST('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                     1, 8) AS BIGINT) % 10000 AS b
          FROM documents
        )
    """,
    tags=("sampling",),
))


def q_x_sample_group_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split: the unit of assignment is the
    GROUP (source), not the document — near-duplicate documents from one
    crawl/site/user otherwise straddle train and test and the eval leaks
    (the standard ML-ops failure that per-row splitting cannot prevent).
    Same zero-shuffle content-addressed hash as x_sample_split, keyed on
    the group column; every doc of a group lands in the same split by
    construction, asserted in pytest and visible in the output grain.
    """
    docs = _t(spark, sf, "documents")
    return hash_split(
        docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "source", "split")


_register(QuerySpec(
    name="x_sample_group_split",
    survey="north-star: leakage-safe group-granular splitting",
    build=q_x_sample_group_split,
    oracle="""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
               CASE
                 WHEN b < 8000 THEN 'train'
                 WHEN b < 9000 THEN 'val'
                 ELSE 'test'
               END AS split
        FROM (
          SELECT doc_id, source,
                 CAST('0x' || substr(md5('split|' || source), 1, 8)
                      AS BIGINT) % 10000 AS b
          FROM documents
        )
    """,
    tags=("sampling", "leakage"),
))


def q_x_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sample over documents: keep 50% of 'en',
    20% of every other language — a single hash-bucket filter pushed to the
    scan, zero shuffles.
    """
    docs = _t(spark, sf, "documents")
    return stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5}, default_fraction=0.2
    ).select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


_register(QuerySpec(
    name="x_sample_stratified",
    survey="north-star: stratified corpus sampling",
    build=q_x_sample_stratified,
    oracle="""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
        FROM (
          SELECT doc_id, lang,
                 CAST('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)),
                                     1, 8) AS BIGINT) % 10000 AS b
          FROM documents
        )
        WHERE b < (CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END)
    """,
    tags=("sampling",),
))


def q_x_sample_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Data-mixing resample: rebalance the corpus to a prescribed language
    recipe (en 40% / zh 20% / es 20% / fr 20%; de dropped). The scarcest
    group binds the budget; thresholds are exact arbitrary-precision ints
    from one tiny group-count aggregate, then a single pushed-down CASE
    filter — the corpus never shuffles (see mixture_resample).
    """
    docs = _t(spark, sf, "documents")
    out = mixture_resample(
        docs, "doc_id", "lang",
        {"en": 400_000, "zh": 200_000, "es": 200_000, "fr": 200_000},
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


_register(QuerySpec(
    name="x_sample_mixture",
    survey="north-star: mixture-weighted corpus rebalancing (data mixing)",
    build=q_x_sample_mixture,
    oracle="""
        WITH counts AS (
          SELECT lang AS g, COUNT(*) AS n FROM documents
          WHERE lang IN ('en','zh','es','fr') GROUP BY 1
        ), w AS (
          SELECT * FROM (VALUES ('en', 400000), ('zh', 200000),
                                ('es', 200000), ('fr', 200000)) AS t(g, wppm)
        ), j AS (
          SELECT w.g, w.wppm, c.n FROM w JOIN counts c USING (g)
        ), b AS (
          SELECT MIN(n * 1000000 // wppm) AS budget FROM j
        ), cuts AS (
          SELECT g, (SELECT budget FROM b) * wppm * 10000
                    // (1000000 * n) AS cut
          FROM j
        )
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
        FROM documents d JOIN cuts ON d.lang = cuts.g
        WHERE (CAST('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)),
                                   1, 8) AS BIGINT) % 10000) < cuts.cut
    """,
    tags=("sampling", "mixing"),
))


def q_x_sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled language rebalance (mT5/XLM-R rule): target share
    p_lang ∝ n_lang^0.5, recipe derived from the corpus itself via exact
    integer largest-remainder allocation, then the mixture_resample
    hash-threshold filter. alpha=0.5 keeps the weight derivation
    bit-portable (sqrt is correctly-rounded IEEE in every engine).
    """
    docs = _t(spark, sf, "documents")
    out = temperature_mixture(docs, "doc_id", "lang", alpha=0.5)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")


_register(QuerySpec(
    name="x_sample_temperature",
    survey="north-star: temperature-scaled mixture sampling (p ∝ n^alpha)",
    build=q_x_sample_temperature,
    oracle="""
        WITH counts AS (
          SELECT lang AS g, CAST(COUNT(*) AS BIGINT) AS n
          FROM documents WHERE lang IS NOT NULL GROUP BY 1
        ), s AS (
          SELECT g, n, CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS sc
          FROM counts
        ), tot AS (
          SELECT SUM(sc) AS t FROM s
        ), base AS (
          SELECT g, n, sc,
                 sc * 1000000 // (SELECT t FROM tot) AS b,
                 sc * 1000000 % (SELECT t FROM tot) AS r
          FROM s
        ), alloc AS (
          SELECT g, n,
                 b + CASE WHEN ROW_NUMBER() OVER (ORDER BY r DESC, g ASC)
                          <= 1000000 - (SELECT SUM(b) FROM base)
                     THEN 1 ELSE 0 END AS wppm
          FROM base
        ), bdg AS (
          SELECT MIN(n * 1000000 // wppm) AS budget FROM alloc
        ), cuts AS (
          SELECT g, (SELECT budget FROM bdg) * wppm * 10000
                    // (1000000 * n) AS cut
          FROM alloc
        )
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
        FROM documents d JOIN cuts ON d.lang = cuts.g
        WHERE (CAST('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)),
                                   1, 8) AS BIGINT) % 10000) < cuts.cut
    """,
    tags=("sampling", "mixing", "temperature"),
))


def q_x_sample_top_frac(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain quality selection: keep the top quarter of documents per
    source by length. Exact-percentile threshold join (broadcast, corpus
    side never shuffles) — not a per-domain window rank.
    """
    docs = _t(spark, sf, "documents")
    kept = top_fraction_per_group(docs, "source", "n_chars", 0.25)
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "n_chars"
    )


_register(QuerySpec(
    name="x_sample_top_frac",
    survey="north-star: per-domain top-fraction quality selection",
    build=q_x_sample_top_frac,
    oracle="""
        WITH thr AS (
          SELECT source, quantile_cont(n_chars, 0.75) AS t
          FROM documents GROUP BY source
        )
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source, d.n_chars
        FROM documents d JOIN thr USING (source)
        WHERE d.n_chars >= thr.t
    """,
    tags=("sampling", "curation"),
))


_Q4_SQL = """CAST(
  (CASE WHEN len(list_filter(string_split_regex(lower(text),
         '[^a-z0-9]+'), x -> x <> '')) >= 20
        THEN 1 ELSE 0 END) +
  (CASE WHEN length(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g'))
         / greatest(length(text), 1) < 0.2
        THEN 1 ELSE 0 END) +
  (CASE WHEN len(list_filter(
          list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> ''),
          x -> list_contains(['the','and','of','to','a','in',
                              'is','it','that','for'], x)))
         / greatest(len(list_filter(string_split_regex(lower(text),
             '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.05
        THEN 1 ELSE 0 END) +
  (CASE WHEN CAST(len(list_distinct(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             x -> x <> ''))) AS DOUBLE)
         / greatest(len(list_filter(string_split_regex(lower(text),
             '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.3
        THEN 1 ELSE 0 END) AS BIGINT)"""


def q_x_curation_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end curation funnel over the corpus slice (doc_id >= 100):
    quality gate -> exact dedup (min-id keep) -> benchmark decontamination
    (8-gram collision vs the fixed-size held-out slice, doc_id < 100 — an
    eval set must not grow with the corpus or its broadcast gram set
    stops being broadcastable). Emits one row per stage with the
    surviving doc count — the dataset-card audit trail every curation
    run ships with.

    Each stage reuses the engine's first-class operator shape: the quality
    gate is a scan-stage expression, dedup is one digest-keyed aggregate,
    decontamination broadcasts the benchmark gram set. Counts are
    all-integer, so the funnel is exactly reproducible cross-engine.
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    bench = docs.filter(F.col("doc_id") < 100)
    base = corpus.select(
        F.col("doc_id").cast("long").alias("id"),
        "text",
        F.md5("text").alias("h"),
        (quality_score("text") * 4).cast("long").alias("q4"),
    )
    # Stage membership as FLAGS folded by one aggregate, not one union'd
    # count() per stage: the union form re-derived the quality/dedup
    # chain once per stage (4 corpus scans, 25 s at sf1); here the corpus
    # is scanned twice (flag frame + contamination gram input) and every
    # stage count is a conditional sum over the same rows (~10 s).
    s2 = base.filter(F.col("q4") >= 3)
    keep = (
        s2.groupBy("h")
        .agg(F.min("id").alias("id"))
        .withColumn("__keep", F.lit(1))
    )
    s3 = s2.join(keep, ["h", "id"], "semi")
    hits = (
        ngram_contamination(
            s3.select(F.col("id").alias("doc_id"), "text"),
            bench, "doc_id", "text", n=8,
        )
        .select("id")
        .distinct()
        .withColumn("__cont", F.lit(1))
    )
    flags = (
        base.join(keep.select("h", "id", "__keep"), ["h", "id"], "left")
        .join(hits, "id", "left")
        .select(
            (F.col("q4") >= 3).alias("__q"),
            F.col("__keep").isNotNull().alias("__k"),
            F.col("__cont").isNull().alias("__c"),
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(F.col("__q").cast("long")).alias("n2"),
        F.sum((F.col("__q") & F.col("__k")).cast("long")).alias("n3"),
        F.sum(
            (F.col("__q") & F.col("__k") & F.col("__c")).cast("long")
        ).alias("n4"),
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("stage_no"),
                        F.lit(label).alias("stage"),
                        F.col(f"n{i}").alias("n_docs"),
                    )
                    for i, label in [
                        (1, "total"),
                        (2, "quality_ok"),
                        (3, "exact_deduped"),
                        (4, "decontaminated"),
                    ]
                ]
            )
        ).alias("__s")
    ).select("__s.*")


_register(QuerySpec(
    name="x_curation_funnel",
    survey="north-star: end-to-end curation funnel (quality -> dedup -> decontamination)",
    build=q_x_curation_funnel,
    oracle=f"""
        WITH corpus AS (
          SELECT CAST(doc_id AS BIGINT) AS id, text, md5(text) AS h,
                 {_Q4_SQL} AS q4
          FROM documents WHERE doc_id >= 100
        ), s2 AS (
          SELECT * FROM corpus WHERE q4 >= 3
        ), s3 AS (
          SELECT s2.id, s2.text FROM s2
          JOIN (SELECT h, MIN(id) AS id FROM s2 GROUP BY h) k
            ON s2.h = k.h AND s2.id = k.id
        ), tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT id, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), bench_g AS (
          SELECT DISTINCT g FROM grams WHERE id < 100
        ), contaminated AS (
          SELECT DISTINCT grams.id FROM grams
          JOIN (SELECT id FROM s3) s USING (id)
          JOIN bench_g USING (g)
        ), s4 AS (
          SELECT id FROM s3
          WHERE id NOT IN (SELECT id FROM contaminated)
        )
        SELECT 1 AS stage_no, 'total' AS stage, COUNT(*) AS n_docs FROM corpus
        UNION ALL
        SELECT 2, 'quality_ok', COUNT(*) FROM s2
        UNION ALL
        SELECT 3, 'exact_deduped', COUNT(*) FROM s3
        UNION ALL
        SELECT 4, 'decontaminated', COUNT(*) FROM s4
    """,
    tags=("text", "pipeline", "curation"),
))


def q_x_text_ccnet_bands(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet perplexity banding: per-language head/middle/tail terciles of
    LM bits/token (rank-based, id tie-broken — engine-exact). The quality
    gate keeps 'middle'; bands also drive curriculum mixing. exact=False
    (percentile_approx cuts, no per-lang sort) is the 100 TB path,
    pytest-covered.
    """
    docs = _t(spark, sf, "documents")
    return ccnet_bands(docs, "doc_id", "text", "lang", exact=True).select(
        F.col("id").alias("doc_id"), "lang", "bits_per_token", "band"
    )


_register(QuerySpec(
    name="x_text_ccnet_bands",
    survey="north-star: CCNet perplexity banding (quality gate / curriculum)",
    build=q_x_text_ccnet_bands,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), vocab AS (
          SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
        ), weighted AS (
          SELECT term,
                 CAST(round(-log2(cnt / CAST((SELECT SUM(cnt) FROM vocab)
                                             AS DOUBLE)) * 1000000)
                      AS BIGINT) AS w_micro
          FROM vocab
        ), scored AS (
          SELECT tf.id,
                 ((CAST(SUM(tf.tf * w.w_micro) AS BIGINT) * 2
                   + CAST(SUM(tf.tf) AS BIGINT) * 100)
                  // (CAST(SUM(tf.tf) AS BIGINT) * 200)) / 10000.0
                   AS bits_per_token
          FROM tf JOIN weighted w USING (term)
          GROUP BY tf.id
        ), banded AS (
          SELECT s.id AS doc_id, d.lang, s.bits_per_token,
                 NTILE(3) OVER (PARTITION BY d.lang
                                ORDER BY s.bits_per_token, s.id) AS b
          FROM scored s JOIN documents d ON s.id = CAST(d.doc_id AS BIGINT)
        )
        SELECT doc_id, lang, bits_per_token,
               CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                      ELSE 'tail' END AS band
        FROM banded
    """,
    tags=("text", "quality", "ccnet"),
))


def q_x_text_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style LM quality score: bits/token under the corpus unigram
    LM, broadcast-vocab join, integer-micro-bit weights for an
    order-independent (engine-deterministic) aggregate.
    """
    docs = _t(spark, sf, "documents")
    return lm_cross_entropy(docs, "doc_id", "text")


_register(QuerySpec(
    name="x_text_lm_score",
    survey="north-star: LM-based quality filtering (unigram cross-entropy)",
    build=q_x_text_lm_score,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        ), vocab AS (
          SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
        ), weighted AS (
          SELECT term,
                 CAST(round(-log2(cnt / CAST((SELECT SUM(cnt) FROM vocab)
                                             AS DOUBLE)) * 1000000)
                      AS BIGINT) AS w_micro
          FROM vocab
        )
        SELECT tf.id,
               CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
               -- integer-space half-up 4dp rounding: (2S + 100n) // (200n)
               -- (double round() straddles exact boundaries like 4.89955)
               ((CAST(SUM(tf.tf * w.w_micro) AS BIGINT) * 2
                 + CAST(SUM(tf.tf) AS BIGINT) * 100)
                // (CAST(SUM(tf.tf) AS BIGINT) * 200)) / 10000.0
                 AS bits_per_token
        FROM tf JOIN weighted w USING (term)
        GROUP BY tf.id
    """,
    tags=("text", "quality", "lm"),
))


def q_x_corpus_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language dataset-card rollup: doc/source counts, token and char
    totals, mean quality. Two exchanges — the unavoidable pair for an exact
    COUNT(DISTINCT) alongside plain aggregates (partial agg keyed by
    (lang, source), final by lang); every input is a row-local expression
    fused into the scan stage, so both exchanges carry only aggregated
    rows, never documents. At 100 TB swap in approx_count_distinct to drop
    back to one exchange.

    Averages are exact-integer-sum / count divisions (quality quantized to
    quarter units first): float AVG is partial-agg-fold-order dependent and
    diverges between engines at the last rounded digit, while one double
    division of exact integers is bit-identical everywhere.
    """
    docs = _t(spark, sf, "documents")
    return (
        docs.select(
            "lang",
            "source",
            token_count_ws("text").cast("long").alias("n_tok"),
            F.length("text").cast("long").alias("n_chars"),
            # quality_score is a sum of 0.25 indicators: *4 is an exact int
            (quality_score("text") * 4).cast("long").alias("q4"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_tok").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_tok").cast("double") / F.count(F.lit(1)))
            .alias("avg_tokens"),
            (F.sum("q4").cast("double") / (F.count(F.lit(1)) * 4))
            .alias("avg_quality"),
        )
    )


_register(QuerySpec(
    name="x_corpus_stats",
    survey="north-star: dataset-card corpus statistics",
    build=q_x_corpus_stats,
    oracle="""
        WITH t AS (
          SELECT lang, source,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tok,
                 CAST(length(text) AS BIGINT) AS n_chars,
                 CAST(
                   (CASE WHEN len(list_filter(string_split_regex(lower(text),
                          '[^a-z0-9]+'), x -> x <> '')) >= 20
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN length(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g'))
                          / greatest(length(text), 1) < 0.2
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN len(list_filter(
                           list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                       x -> x <> ''),
                           x -> list_contains(['the','and','of','to','a','in',
                                               'is','it','that','for'], x)))
                          / greatest(len(list_filter(string_split_regex(lower(text),
                              '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.05
                         THEN 1 ELSE 0 END) +
                   (CASE WHEN CAST(len(list_distinct(list_filter(
                              string_split_regex(lower(text), '[^a-z0-9]+'),
                              x -> x <> ''))) AS DOUBLE)
                          / greatest(len(list_filter(string_split_regex(lower(text),
                              '[^a-z0-9]+'), x -> x <> '')), 1) >= 0.3
                         THEN 1 ELSE 0 END) AS BIGINT) AS q4
          FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               -- DuckDB SUM(BIGINT) yields HUGEINT, which pandas renders as
               -- float64 ("19525.0" vs "19525") — cast back to BIGINT so the
               -- value hash matches Spark's long
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_tok) AS DOUBLE) / COUNT(*) AS avg_tokens,
               CAST(SUM(q4) AS DOUBLE) / (COUNT(*) * 4) AS avg_quality
        FROM t GROUP BY lang
    """,
    tags=("text", "stats"),
))


def q_x_sample_uniform_k(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-100 deterministic uniform sample: order by md5(salt|id), take
    k. Plans as TakeOrderedAndProject (per-partition top-k heaps, k-row
    driver merge) — no global sort, no full shuffle.
    """
    docs = _t(spark, sf, "documents")
    return uniform_sample_k(docs, "doc_id", 100).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )


_register(QuerySpec(
    name="x_sample_uniform_k",
    survey="north-star: fixed-size uniform sampling / deterministic corpus shuffle",
    build=q_x_sample_uniform_k,
    oracle="""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
        FROM documents
        ORDER BY md5('uk|' || CAST(doc_id AS VARCHAR)) ASC
        LIMIT 100
    """,
    tags=("sampling",),
))


def q_x_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget sequence packing (context-window assembly): contiguous
    offset packing within (lang, shard) windows, budget 256 whitespace
    tokens, 4 shards. One shuffle — the hash exchange feeding the window;
    shard = id % n bounds every sort partition.
    """
    docs = _t(spark, sf, "documents")
    return pack_sequences(
        docs, "doc_id", "lang", token_count_ws("text"), budget=256, n_shards=4
    )


_register(QuerySpec(
    name="x_pack_sequences",
    survey="north-star: sequence packing for training batches",
    build=q_x_pack_sequences,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id, lang,
                 CAST(CAST(doc_id AS BIGINT) % 4 AS INT) AS shard,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        )
        SELECT id, lang, shard, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang, shard
                                               ORDER BY id) - n_tokens)
                          / 256.0) AS BIGINT) AS seq_bin
        FROM toks
    """,
    tags=("sampling", "packing"),
))


def q_x_pack_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Shard delivery manifest over the packed sequences: per
    (lang, shard, seq_bin) doc count, token total, and an md5 digest of
    the sorted member ids — the artifact a training job verifies before
    consuming an export. Composed directly over pack_sequences, the
    manifest groupBy reuses the packing window's exchange.
    """
    docs = _t(spark, sf, "documents")
    packed = pack_sequences(
        docs, "doc_id", "lang", token_count_ws("text"), budget=256, n_shards=4
    )
    return shard_manifest(packed, "lang").select(
        "lang", "shard", "seq_bin",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "id_digest",
    )


_register(QuerySpec(
    name="x_pack_manifest",
    survey="north-star: shard manifest (verifiable training-data delivery)",
    build=q_x_pack_manifest,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id, lang,
                 CAST(CAST(doc_id AS BIGINT) % 4 AS INT) AS shard,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM documents
        ), packed AS (
          SELECT id, lang, shard, n_tokens,
                 CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang, shard
                                                 ORDER BY id) - n_tokens)
                            / 256.0) AS BIGINT) AS seq_bin
          FROM toks
        )
        SELECT lang, shard, seq_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               md5(string_agg(CAST(id AS VARCHAR), ',' ORDER BY id)) AS id_digest
        FROM packed
        GROUP BY 1, 2, 3
    """,
    tags=("sampling", "packing", "manifest"),
))


def q_x_text_rollhash(spark: SparkSession, sf: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint per document (polynomial content
    hash, the chunk-dedup primitive) — a pure JVM fold, no UDF; the oracle
    re-computes the identical fold with DuckDB list_reduce.
    """
    docs = _t(spark, sf, "documents")
    return docs.select("doc_id", rolling_fingerprint("text").alias("rollhash"))


_register(QuerySpec(
    name="x_text_rollhash",
    survey="north-star: rolling-hash document fingerprinting",
    build=q_x_text_rollhash,
    oracle="""
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                     list_filter(
                       string_split_regex(regexp_replace(text, '[^ -~]', '', 'g'), ''),
                       ch -> ch <> ''),
                     ch -> CAST(ascii(ch) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % 1000000007) AS rollhash
        FROM documents
    """,
    tags=("text", "fingerprint"),
))


def q_x_dedup_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """The composed near-dup pipeline (LSH candidates -> Jaccard verify ->
    cluster -> drop losers) over documents. The oracle re-derives the whole
    chain declaratively: shingle -> salted-min-hash bands -> bucket join ->
    Jaccard over candidates -> recursive-CTE connected components ->
    anti-join of cluster losers. Pipeline idempotence is asserted in tests.
    """
    docs = _t(spark, sf, "documents")
    return near_dup_dedup(
        docs, "doc_id", "text", threshold=0.8, max_doc_freq=None,
        max_bucket_size=None,
    ).select(
        "doc_id", "lang", "source", "n_chars"
    )


_register(QuerySpec(
    name="x_dedup_pipeline",
    survey="north-star: end-to-end near-dup dedup pipeline",
    bench=True,
    build=q_x_dedup_pipeline,
    oracle="""
        WITH RECURSIVE tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        ), verified AS (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sizes za ON za.id = i.id_a
          JOIN sizes zb ON zb.id = i.id_b
          WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.8
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION
          SELECT id_b, id_a FROM verified
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), losers AS (
          SELECT id FROM (SELECT id, MIN(lab) AS component FROM reach GROUP BY id)
          WHERE id <> component
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN losers l ON CAST(d.doc_id AS BIGINT) = l.id
        WHERE l.id IS NULL
    """,
    tags=("dedup", "pipeline"),
))


def q_x_dedup_cluster_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card duplication profile: near-dup cluster-size histogram
    (cluster_size, n_clusters, n_docs) over the same verified-pair graph
    as x_dedup_pipeline, with size 1 = unclustered docs. The numbers a
    curation report quotes before committing to the drop.
    """
    docs = _t(spark, sf, "documents")
    return dedup_cluster_stats(
        docs, "doc_id", "text", threshold=0.8, max_doc_freq=None,
        max_bucket_size=None,
    )


_register(QuerySpec(
    name="x_dedup_cluster_stats",
    survey="north-star: dedup dataset card (cluster-size histogram)",
    build=q_x_dedup_cluster_stats,
    oracle="""
        WITH RECURSIVE tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        ), verified AS (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sizes za ON za.id = i.id_a
          JOIN sizes zb ON zb.id = i.id_b
          WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.8
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION
          SELECT id_b, id_a FROM verified
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), comp AS (
          SELECT id, MIN(lab) AS component FROM reach GROUP BY id
        ), cl AS (
          SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1
        ), hist AS (
          SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                 CAST(COUNT(*) AS BIGINT) AS n_clusters
          FROM cl GROUP BY 1
        ), allrows AS (
          SELECT cluster_size, n_clusters FROM hist
          UNION ALL
          SELECT CAST(1 AS BIGINT),
                 (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM comp)
          WHERE (SELECT COUNT(*) FROM documents) > (SELECT COUNT(*) FROM comp)
        )
        SELECT cluster_size, n_clusters,
               cluster_size * n_clusters AS n_docs
        FROM allrows
    """,
    tags=("dedup", "stats", "dataset-card"),
))


def q_x_text_dup_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-internal duplicated-8-gram fraction per document — the
    scalable stand-in for exact-substring dedup (Lee et al. 2022). Shuffles
    carry 32-char gram digests, never text; one agg keyed by digest, one
    digest-co-partitioned flag join, one final per-doc exchange.
    """
    docs = _t(spark, sf, "documents")
    out = duplicated_ngram_fraction(docs, "doc_id", "text", n=8)
    return out.select(
        F.col("id").alias("doc_id"), "n_grams", "n_dup_grams", "dup_fraction"
    )


_register(QuerySpec(
    name="x_text_dup_ngrams",
    survey="north-star: corpus-internal duplicated n-gram signal",
    build=q_x_text_dup_ngrams,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), grams AS (
          SELECT DISTINCT id, array_to_string(toks[i : i + 7], ' ') AS g
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), freq AS (
          SELECT g, COUNT(*) AS doc_freq FROM grams GROUP BY g
        )
        SELECT grams.id AS doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN freq.doc_freq >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_grams,
               CAST(SUM(CASE WHEN freq.doc_freq >= 2 THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS dup_fraction
        FROM grams JOIN freq USING (g)
        GROUP BY 1
    """,
    tags=("text", "dedup"),
))


def q_x_text_scrub_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-substring REMOVAL (Lee et al. 2022 / RefinedWeb): tokens
    covered by an 8-gram occurring >= 2 times anywhere in the corpus are
    dropped and each doc is reassembled in order. Gram occurrence count is
    one window over the gram-digest exchange; covered positions expand
    JVM-side; the keep filter is a left-anti join; reassembly is one
    ordered collect_list exchange on id.
    """
    docs = _t(spark, sf, "documents")
    out = scrub_shared_spans(docs, "doc_id", "text", n=8, min_count=2)
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "n_removed", "cleaned_text"
    )


_register(QuerySpec(
    name="x_text_scrub_spans",
    survey="north-star: cross-document duplicated-substring removal",
    build=q_x_text_scrub_spans,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), g AS (
          SELECT id, j AS start,
                 md5(array_to_string(toks[j : j + 7], ' ')) AS gh
          FROM tk, UNNEST(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(j)
        ), hot AS (
          SELECT id, start FROM (
            SELECT id, start, COUNT(*) OVER (PARTITION BY gh) AS cnt FROM g
          ) WHERE cnt >= 2
        ), covered AS (
          SELECT DISTINCT id, p AS pos
          FROM hot, UNNEST(range(start, start + 8)) AS v(p)
        ), tok_rows AS (
          SELECT id, j AS pos, toks[j] AS tok
          FROM tk, UNNEST(range(1, len(toks) + 1)) AS u(j)
        ), kept AS (
          SELECT tr.id, tr.pos, tr.tok
          FROM tok_rows tr LEFT JOIN covered c
            ON tr.id = c.id AND tr.pos = c.pos
          WHERE c.pos IS NULL
        ), reb AS (
          SELECT id, COUNT(*) AS n_kept,
                 string_agg(tok, ' ' ORDER BY pos) AS cleaned_text
          FROM kept GROUP BY id
        )
        SELECT tk.id AS doc_id,
               CAST(len(tk.toks) AS BIGINT) AS n_tokens,
               CAST(len(tk.toks) - COALESCE(reb.n_kept, 0) AS BIGINT)
                 AS n_removed,
               COALESCE(reb.cleaned_text, '') AS cleaned_text
        FROM tk LEFT JOIN reb ON tk.id = reb.id
    """,
    tags=("text", "dedup", "scrub"),
))


def q_x_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup dedup with quality-aware representative selection: the same
    LSH->Jaccard->cluster chain as x_dedup_pipeline, but each cluster keeps
    its LONGEST member (n_chars desc, id asc tiebreak) instead of the
    smallest id — the production keep rule when near-dups differ by
    truncation or boilerplate stripping.
    """
    docs = _t(spark, sf, "documents")
    arrs = shingle_arrays(docs, "doc_id", "text", 3).persist()
    candidates = minhash_candidate_pairs(
        docs, "doc_id", "text", 8, 2, 3, max_bucket_size=None, shingles=arrs
    )
    verified = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, shingle_n=3,
        candidates=candidates, max_doc_freq=None, shingle_arrays_df=arrs,
    )
    kept = dedup_corpus_best(docs, verified, "doc_id", "n_chars")
    return kept.select("doc_id", "lang", "source", "n_chars")


_register(QuerySpec(
    name="x_dedup_keep_best",
    survey="north-star: near-dup dedup, quality-argmax representative",
    build=q_x_dedup_keep_best,
    oracle="""
        WITH RECURSIVE tk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        ), verified AS (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sizes za ON za.id = i.id_a
          JOIN sizes zb ON zb.id = i.id_b
          WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.8
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION
          SELECT id_b, id_a FROM verified
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), comps AS (
          SELECT id, MIN(lab) AS component FROM reach GROUP BY id
        ), losers AS (
          SELECT id FROM (
            SELECT c.id,
                   ROW_NUMBER() OVER (
                     PARTITION BY c.component
                     ORDER BY d.n_chars DESC, c.id ASC) AS rn
            FROM comps c JOIN documents d ON CAST(d.doc_id AS BIGINT) = c.id)
          WHERE rn > 1
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d LEFT JOIN losers l ON CAST(d.doc_id AS BIGINT) = l.id
        WHERE l.id IS NULL
    """,
    tags=("dedup", "pipeline"),
))


def q_x_sim_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: fixed coarse centroids, corpus bucketed by nearest
    cell, queries probe their 2 nearest cells. Deterministic (centroids are
    the first 8 vectors, no trained state) and therefore oracle-checkable,
    unlike the sign-LSH path whose recall is asserted in tests instead.
    """
    emb = _t(spark, sf, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries_df, centroids, k=10, nprobe=2)


_register(QuerySpec(
    name="x_sim_ivf",
    survey="north-star: ANN IVF",
    build=q_x_sim_ivf,
    oracle=f"""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS cvec
          FROM embeddings WHERE vec_id < 8
        ), corpus_assign AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     {_COS_SQL.format(a="e.embedding", b="c.cvec")} DESC,
                     c.centroid_id ASC) AS rn
            FROM embeddings e CROSS JOIN cent c)
          WHERE rn = 1
        ), probes AS (
          SELECT query_id, embedding, centroid_id FROM (
            SELECT q.vec_id AS query_id, q.embedding, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                     {_COS_SQL.format(a="q.embedding", b="c.cvec")} DESC,
                     c.centroid_id ASC) AS rn
            FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 5)
          WHERE rn <= 2
        ), scored AS (
          SELECT p.query_id, a.vec_id,
                 ROUND({_COS_SQL.format(a="a.embedding", b="p.embedding")}, 4) AS score
          FROM corpus_assign a JOIN probes p USING (centroid_id)
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    tags=("similarity", "ivf"),
))


def q_x_sim_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """One Lloyd k-means iteration over the embedding corpus (SemDeDup-style
    semantic clustering): assign to 8 self-seeded cells, recompute centroids,
    re-assign. Per iteration: zero-shuffle literal-centroid assignment + one
    bounded (cells × dims) aggregation — no N×k join.

    Exactness contract (see kmeans_lloyd): micro-unit integer vectors,
    integer centroid sums, score = double(dot)/sqrt(double(norm)) — every
    comparison runs on bit-identical values in Spark and DuckDB, so the
    int-only output hashes exactly.
    """
    emb = _t(spark, sf, "embeddings")
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    out = kmeans_lloyd(emb, seeds, n_iter=1)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("centroid_id").cast("int").alias("centroid_id"),
    )


_register(QuerySpec(
    name="x_sim_kmeans",
    survey="north-star: k-means corpus clustering (SemDeDup cell step)",
    build=q_x_sim_kmeans,
    oracle="""
        WITH m AS (
          SELECT vec_id,
                 list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mv
          FROM embeddings
        ), c0 AS (
          SELECT vec_id AS cid, mv AS cv FROM m WHERE vec_id < 8
        ), s0 AS (
          SELECT m.vec_id, c0.cid,
                 CAST(list_aggregate(list_transform(list_zip(m.mv, c0.cv),
                       p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / sqrt(CAST(list_aggregate(list_transform(c0.cv,
                       x -> CAST(x AS HUGEINT) * x), 'sum') AS DOUBLE)) AS score
          FROM m CROSS JOIN c0
        ), a0 AS (
          SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, cid ASC) AS rn FROM s0)
          WHERE rn = 1
        ), sums AS (
          SELECT a0.cid, p.pos, SUM(m.mv[p.pos]) AS s
          FROM a0 JOIN m USING (vec_id),
               UNNEST(generate_series(1, len(m.mv))) AS p(pos)
          GROUP BY a0.cid, p.pos
        ), c1 AS (
          SELECT cid, list(CAST(s AS BIGINT) ORDER BY pos) AS cv
          FROM sums GROUP BY cid
        ), s1 AS (
          SELECT m.vec_id, c1.cid,
                 CAST(list_aggregate(list_transform(list_zip(m.mv, c1.cv),
                       p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / sqrt(CAST(list_aggregate(list_transform(c1.cv,
                       x -> CAST(x AS HUGEINT) * x), 'sum') AS DOUBLE)) AS score
          FROM m CROSS JOIN c1
        )
        SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS INT) AS centroid_id
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY score DESC, cid ASC) AS rn FROM s1)
        WHERE rn = 1
    """,
    tags=("similarity", "kmeans", "clustering"),
))


def q_x_dedup_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end to end: k-means the embedding
    corpus into cells, enumerate cosine near-dup pairs WITHIN each cell
    only, cluster the pair graph, keep one representative per cluster.
    The cell step is what makes semantic dedup scale — pair enumeration is
    an equi self-join on the learned cell id, never a cross product; the
    kmeans pass itself is zero-shuffle assignment + one bounded
    aggregation per iteration. The cell count scales with the corpus
    (k = round(sqrt(N)), floor 8): fixed-k cells grow linearly with N and
    make the in-cell pairing quadratic — sf1 benching caught exactly
    that. Past 32 cells the assignment rides kmeans_lloyd's Arrow-batched
    numpy path automatically.
    """
    emb = _t(spark, sf, "embeddings")
    k = max(8, int(math.floor(math.sqrt(emb.count()) + 0.5)))
    seeds = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_vec")
    )
    assign = kmeans_lloyd(emb, seeds, n_iter=1)
    # both sides of the in-cell self-join consume the assigned corpus;
    # persisting it runs the kmeans assignment once instead of twice.
    cells = emb.join(assign, "vec_id").persist()
    pairs = embedding_near_dup_pairs(
        cells, threshold=0.30, block_col="centroid_id"
    )
    kept = dedup_corpus(emb, pairs, "vec_id")
    return kept.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("int").alias("label"),
    )


_register(QuerySpec(
    name="x_dedup_semdedup",
    survey="north-star: SemDeDup semantic dedup (kmeans cells -> in-cell near-dup -> drop)",
    bench=True,
    build=q_x_dedup_semdedup,
    oracle=f"""
        WITH RECURSIVE m AS (
          SELECT vec_id,
                 list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS mv
          FROM embeddings
        ), c0 AS (
          SELECT vec_id AS cid, mv AS cv FROM m
          WHERE vec_id < (SELECT greatest(8,
                    CAST(floor(sqrt(COUNT(*)) + 0.5) AS BIGINT))
                          FROM embeddings)
        ), s0 AS (
          SELECT m.vec_id, c0.cid,
                 CAST(list_aggregate(list_transform(list_zip(m.mv, c0.cv),
                       p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / sqrt(CAST(list_aggregate(list_transform(c0.cv,
                       x -> CAST(x AS HUGEINT) * x), 'sum') AS DOUBLE)) AS score
          FROM m CROSS JOIN c0
        ), a0 AS (
          SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, cid ASC) AS rn FROM s0)
          WHERE rn = 1
        ), sums AS (
          SELECT a0.cid, p.pos, SUM(m.mv[p.pos]) AS s
          FROM a0 JOIN m USING (vec_id),
               UNNEST(generate_series(1, len(m.mv))) AS p(pos)
          GROUP BY a0.cid, p.pos
        ), c1 AS (
          SELECT cid, list(CAST(s AS BIGINT) ORDER BY pos) AS cv
          FROM sums GROUP BY cid
        ), s1 AS (
          SELECT m.vec_id, c1.cid,
                 CAST(list_aggregate(list_transform(list_zip(m.mv, c1.cv),
                       p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / sqrt(CAST(list_aggregate(list_transform(c1.cv,
                       x -> CAST(x AS HUGEINT) * x), 'sum') AS DOUBLE)) AS score
          FROM m CROSS JOIN c1
        ), a1 AS (
          SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                        ORDER BY score DESC, cid ASC) AS rn FROM s1)
          WHERE rn = 1
        ), pairs AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id FROM (
            SELECT ea.vec_id, ea.embedding, aa.cid
            FROM embeddings ea JOIN a1 aa USING (vec_id)) a
          JOIN (
            SELECT eb.vec_id, eb.embedding, ab.cid
            FROM embeddings eb JOIN a1 ab USING (vec_id)) b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE ROUND({_COS_SQL.format(a="a.embedding", b="b.embedding")}, 4)
                >= 0.30
        ), edges AS (
          SELECT a_id AS src, b_id AS dst FROM pairs
          UNION
          SELECT b_id, a_id FROM pairs
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), losers AS (
          SELECT id FROM (SELECT id, MIN(lab) AS component FROM reach GROUP BY id)
          WHERE id <> component
        )
        SELECT CAST(e.vec_id AS BIGINT) AS vec_id, CAST(e.label AS INT) AS label
        FROM embeddings e LEFT JOIN losers l ON e.vec_id = l.id
        WHERE l.id IS NULL
    """,
    tags=("dedup", "similarity", "pipeline"),
))


# --------------------------------------------------------------------------
# Round-4 extensions: quantized ANN, model-based quality gate, Z-order layout,
# encrypted vendor inbox (S3/S4 in-engine analog)
# --------------------------------------------------------------------------

def q_s3_encrypted_inbox(spark: SparkSession, sf: str) -> DataFrame:
    """S3+S4 in-engine analog (scripts/s3_upload_automation.py:83-174):
    per-table vendor inbox of encrypted CSV exports; the source lists the
    inbox (metadata only), picks the LATEST export per table by mtime
    (reference :115-117), decrypts DISTRIBUTED (binaryFile + mapInPandas
    with a pluggable cipher — gnupg is out-of-container, the test cipher
    drives the identical path), and parses CSV JVM-side via from_csv with
    permissive casts. The fixture plants two generations per table with
    pinned mtimes; only generation 2 may surface — which is exactly what
    the oracle asserts over the source parquet.
    """
    import os as _os

    root = _scratch(sf, "vendor_inbox")
    cust = (
        _t(spark, sf, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .toPandas()
        .sort_values("c_custkey")
    )
    _ship_package(spark)
    key = 0x5A

    def _enc(text: str) -> bytes:
        return bytes(b ^ key for b in text.encode("utf-8"))

    halves = (
        ("cust_even", cust[cust.c_custkey % 2 == 0]),
        ("cust_odd", cust[cust.c_custkey % 2 == 1]),
    )
    for table, part in halves:
        d = f"{root}/{table}"
        _os.makedirs(d, exist_ok=True)
        for gen, mtime in ((1, 1_000_000_000), (2, 1_100_000_000)):
            lines = ["c_custkey,c_name,c_acctbal,load_gen"] + [
                f"{int(k)},{n},{float(a)!r},{gen}"
                for k, n, a in zip(part.c_custkey, part.c_name, part.c_acctbal)
            ]
            p = f"{d}/export_gen{gen}.csv.gpg"
            with open(p, "wb") as fh:
                fh.write(_enc("\n".join(lines)))
            _os.utime(p, (mtime, mtime))

    out = read_latest_encrypted_inbox(
        spark,
        root,
        {
            "c_custkey": "bigint",
            "c_name": "string",
            "c_acctbal": "double",
            "load_gen": "int",
        },
        decryptor=xor_decryptor(key),
    )
    return out


_register(QuerySpec(
    name="s3_encrypted_inbox",
    survey="S3+S4: latest-file-per-table vendor inbox + distributed decrypt stage",
    build=q_s3_encrypted_inbox,
    oracle="""
        SELECT c_custkey, c_name, c_acctbal, CAST(2 AS INT) AS load_gen
        FROM customer
    """,
    tags=("source", "decrypt"),
))



def q_x_sim_quantized(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 scalar-quantized ANN (faiss-SQ8 posture): the corpus is stored
    as per-vector symmetric int8 codes (4x smaller than float32 — the
    representation you keep at 100 TB), scored by cosine over the codes.
    Quantize is a zero-shuffle narrow map; the top-k reuses the broadcast
    -queries + window plan of the exact baseline; recall vs the float
    baseline is asserted in tests/test_extensions.py.
    """
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return quantized_topk(emb, queries_df, k=10)


_register(QuerySpec(
    name="x_sim_quantized",
    survey="north-star: ANN over int8-quantized embeddings (SQ8)",
    build=q_x_sim_quantized,
    oracle="""
        WITH sc AS (
          SELECT vec_id, embedding,
                 list_aggregate(list_transform(embedding,
                     y -> abs(CAST(y AS DOUBLE))), 'max') AS scale
          FROM embeddings
        ), qz AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
                                   NULLIF(scale, 0.0)) AS BIGINT)) AS qv
          FROM sc
        ), q AS (
          SELECT vec_id AS query_id, qv AS q_qv FROM qz WHERE vec_id < 5
        ), scored AS (
          SELECT q.query_id, c.vec_id,
                 ROUND(
                   CAST(list_aggregate(list_transform(list_zip(c.qv, q.q_qv),
                          p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / (sqrt(CAST(list_aggregate(list_transform(c.qv,
                          x -> x * x), 'sum') AS DOUBLE))
                    * sqrt(CAST(list_aggregate(list_transform(q.q_qv,
                          x -> x * x), 'sum') AS DOUBLE))), 4) AS score_q
          FROM qz c CROSS JOIN q
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY score_q DESC, vec_id ASC) AS rn
          FROM scored
        )
        SELECT query_id, vec_id, score_q FROM ranked WHERE rn <= 10
    """,
    tags=("similarity", "quantization"),
))


def q_x_text_quality_model(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality gate (fastText/DCLM-classifier posture): a
    feature-hashed linear model scores every document in a ZERO-SHUFFLE
    narrow map (hash token -> bucket -> weight, fold, one division).
    Weights derive deterministically from the bucket id so the oracle
    reproduces exact scores; trained weights drop in as a plan literal.
    """
    docs = _t(spark, sf, "documents")
    out = hashed_linear_score(docs, "doc_id", "text", n_buckets=64,
                              threshold=-140.0)
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        "n_tok", "raw_score", "quality_logit", "keep",
    )


_register(QuerySpec(
    name="x_text_quality_model",
    survey="north-star: model-based quality filtering (hashed linear classifier)",
    build=q_x_text_quality_model,
    oracle="""
        WITH tk AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), w AS (
          SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
                 CAST(COALESCE(list_aggregate(list_transform(toks,
                   t -> ((CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 64)
                          * 2654435761 % 1997) - 998), 'sum'), 0)
                      AS BIGINT) AS raw_score
          FROM tk
        )
        SELECT doc_id, n_tok, raw_score,
               CASE WHEN n_tok > 0
                    THEN ROUND(CAST(raw_score AS DOUBLE) / n_tok, 4) END
                 AS quality_logit,
               CAST(CASE WHEN n_tok > 0
                          AND CAST(raw_score AS DOUBLE) / n_tok >= -140.0
                         THEN 1 ELSE 0 END AS INT) AS keep
        FROM w
    """,
    tags=("text", "quality", "classifier"),
))


def q_scale_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) lake layout: orders written range-sorted on the
    interleaved bits of (o_custkey, order day), so every parquet file is a
    small rectangle in key space and predicates on EITHER column skip
    files at the scan — the multi-dimensional companion to
    scale_sorted_layout's single-key SORTKEY. The Morton code itself is
    engine-portable integer arithmetic, recomputed by the oracle, so the
    layout math (not just its effect) is driver-verified; per-file min/max
    tightness on both keys is asserted in tests/test_scale.py.
    """
    out_path = _scratch(sf, "orders_zorder")
    orders = _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("o_day"),
    )
    write_zorder(orders, out_path, ["o_custkey", "o_day"], n_files=8)
    scan = spark.read.parquet(out_path).filter(
        (F.col("o_custkey") >= 10)
        & (F.col("o_custkey") < 60)
        & (F.col("o_day") >= 1100)
        & (F.col("o_day") < 1400)
    )
    sel = scan.select(
        "o_orderkey",
        "o_custkey",
        "o_day",
        "o_totalprice",
        morton_code(F.col("o_custkey"), F.col("o_day"), bits=16).alias("z_code"),
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    pushed = "PushedFilters: [" in plan and "PushedFilters: []" not in plan
    return sel.withColumn("plan_pushdown", F.lit(1 if pushed else 0).cast("int"))


_register(QuerySpec(
    name="scale_zorder_layout",
    survey="scale: Z-order multi-dimensional lake layout (OPTIMIZE ZORDER parity)",
    build=q_scale_zorder_layout,
    oracle=f"""
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                    AS BIGINT) AS o_day,
               o_totalprice,
               {morton_sql("o_custkey",
                           "CAST(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)",
                           bits=16)} AS z_code,
               CAST(1 AS INT) AS plan_pushdown
        FROM orders
        WHERE o_custkey >= 10 AND o_custkey < 60
          AND date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) >= 1100
          AND date_diff('day', TIMESTAMP '1992-01-01', o_orderdate) < 1400
    """,
    tags=("scale", "layout", "zorder"),
))


def q_x_dedup_minhash_est(spark: SparkSession, sf: str) -> DataFrame:
    """Signature-based Jaccard ESTIMATE over the LSH candidates — the
    cheap middle stage between banding and exact verification (scoring a
    pair touches 2x8 min-hashes, not two shingle sets), so pairs far
    below the dedup threshold never reach the array-intersect verify.
    """
    docs = _t(spark, sf, "documents")
    arrs = shingle_arrays(docs, "doc_id", "text", 3).persist()
    return minhash_jaccard_estimate(
        docs, "doc_id", "text", num_hashes=8, shingle_n=3,
        band_size=2, min_estimate=0.0, shingles=arrs,
    )


_register(QuerySpec(
    name="x_dedup_minhash_est",
    survey="north-star: MinHash signature Jaccard estimate (pre-verify filter)",
    build=q_x_dedup_minhash_est,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id,
                   array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx,
                 md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash
          FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        )
        SELECT c.id_a, c.id_b,
               ROUND(CAST(SUM(CASE WHEN sa.min_hash = sb.min_hash
                                   THEN 1 ELSE 0 END) AS DOUBLE) / 8, 4)
                 AS est_jaccard
        FROM cand c
        JOIN sigs sa ON sa.id = c.id_a
        JOIN sigs sb ON sb.id = c.id_b AND sb.hash_idx = sa.hash_idx
        GROUP BY 1, 2
    """,
    tags=("dedup", "minhash", "estimate"),
))


def q_x_text_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Vocabulary-coverage analysis: top-V corpus vocabulary (frequency
    desc, term asc tiebreak — TakeOrderedAndProject, no single-partition
    exchange) broadcast-joined back for per-doc OOV rates — the
    dataset-card metric for tokenizer fit / out-of-domain detection.
    """
    docs = _t(spark, sf, "documents")
    out = vocab_oov_rate(docs, "doc_id", "text", vocab_size=32)
    return out.select(
        F.col("id").alias("doc_id"), "n_tok", "n_oov", "oov_rate"
    )


_register(QuerySpec(
    name="x_text_vocab",
    survey="north-star: corpus vocabulary build + per-doc OOV rate",
    bench=True,
    build=q_x_text_vocab,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS term
          FROM documents
        ), counts AS (
          SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
        ), vocab AS (
          SELECT term FROM counts ORDER BY cnt DESC, term ASC LIMIT 32
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_oov,
               ROUND(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
                     / COUNT(*), 4) AS oov_rate
        FROM toks t LEFT JOIN vocab v ON t.term = v.term
        GROUP BY 1
    """,
    tags=("text", "vocab"),
))


def q_x_text_token_ids(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenization stage: every document encoded as its token-ID sequence
    against the corpus top-32 vocabulary (ids 1-based in frequency order,
    unk = 0), ids rendered comma-joined in document order. One (term,
    count) exchange builds the vocabulary; the (term -> id) map broadcasts
    as a one-row map column and the encoding is a narrow per-doc
    transform — the corpus never shuffles.
    """
    docs = _t(spark, sf, "documents")
    return tokenize_to_ids(docs, "doc_id", "text", vocab_size=32).select(
        F.col("id").alias("doc_id"), "n_tok", "ids"
    )


_register(QuerySpec(
    name="x_text_token_ids",
    survey="north-star: text -> token-id sequences (tokenizer plumbing)",
    build=q_x_text_token_ids,
    oracle="""
        WITH toks AS (
          SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS term
          FROM documents
        ), counts AS (
          SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1
        ), vocab AS (
          SELECT term, ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS tid
          FROM (SELECT * FROM counts ORDER BY cnt DESC, term ASC LIMIT 32)
        ), seq AS (
          SELECT CAST(doc_id AS BIGINT) AS id, arr[j] AS term, j
          FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS arr
            FROM documents
          ), UNNEST(range(1, len(arr) + 1)) AS u(j)
        )
        SELECT s.id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
               string_agg(CAST(COALESCE(v.tid, 0) AS VARCHAR), ','
                          ORDER BY s.j) AS ids
        FROM seq s LEFT JOIN vocab v USING (term)
        GROUP BY s.id
    """,
    tags=("text", "tokenizer"),
))


def q_x_sim_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage ANN: int8-quantized scan keeps 50 candidates per query,
    exact float cosine re-ranks them to the final top-10 — the production
    SQ8 pattern (full-precision vectors touched for |queries| x 50 rows,
    not the corpus). The oracle replays both stages declaratively.
    """
    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return quantized_rerank_topk(emb, queries_df, k=10, prefetch=50)


_register(QuerySpec(
    name="x_sim_rerank",
    survey="north-star: two-stage ANN (quantized scan + exact re-rank)",
    bench=True,
    build=q_x_sim_rerank,
    oracle=f"""
        WITH sc AS (
          SELECT vec_id, embedding,
                 list_aggregate(list_transform(embedding,
                     y -> abs(CAST(y AS DOUBLE))), 'max') AS scale
          FROM embeddings
        ), qz AS (
          SELECT vec_id, embedding,
                 list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
                                   NULLIF(scale, 0.0)) AS BIGINT)) AS qv
          FROM sc
        ), q AS (
          SELECT vec_id AS query_id, qv AS q_qv, embedding AS q_vec
          FROM qz WHERE vec_id < 5
        ), stage1 AS (
          SELECT q.query_id, c.vec_id, c.embedding AS c_vec, q.q_vec,
                 ROUND(
                   CAST(list_aggregate(list_transform(list_zip(c.qv, q.q_qv),
                          p -> p[1] * p[2]), 'sum') AS DOUBLE)
                   / (sqrt(CAST(list_aggregate(list_transform(c.qv,
                          x -> x * x), 'sum') AS DOUBLE))
                    * sqrt(CAST(list_aggregate(list_transform(q.q_qv,
                          x -> x * x), 'sum') AS DOUBLE))), 4) AS score_q
          FROM qz c CROSS JOIN q
        ), prefetch AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score_q DESC, vec_id ASC) AS rn1
            FROM stage1
          ) WHERE rn1 <= 50
        ), exact AS (
          SELECT query_id, vec_id,
                 ROUND({_COS_SQL.format(a="c_vec", b="q_vec")}, 4) AS score
          FROM prefetch
        )
        SELECT query_id, vec_id, score FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY score DESC, vec_id ASC) AS rn
          FROM exact
        ) WHERE rn <= 10
    """,
    tags=("similarity", "quantization", "rerank"),
))


def q_a_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE companion to a_rollup: all four grains of (returnflag,
    linestatus) in one pass with GROUPING flags — the §2.4 multi-grain
    family completed (ROLLUP = hierarchy, CUBE = full lattice). Same
    partial+final aggregation shape as a plain GROUP BY; the lattice
    expansion happens map-side in the Expand operator, so no extra
    shuffle.
    """
    li = _t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_rows"),
            _dec_sum("l_extendedprice", "sum_price"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            "g_flag", "g_status", "n_rows", "sum_price",
        )
    )


def q_a_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS — the third member of the multi-grain
    family (ROLLUP = hierarchy, CUBE = lattice, GROUPING SETS = exactly
    the grains you pay for): per-status and per-priority totals in one
    pass WITHOUT the (status, priority) cross grain CUBE would also
    compute. Same map-side Expand, one exchange; at 100 TB skipping the
    fine-grained cross grain is most of the cube's output volume.
    """
    o = _t(spark, sf, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            _dec_sum("o_totalprice", "sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority",
            "g_status", "g_priority", "n_orders", "sum_price",
        )
    )


_register(QuerySpec(
    name="a_grouping_sets",
    survey="A9 (generalized): explicit GROUPING SETS (pay-per-grain)",
    build=q_a_grouping_sets,
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping-sets"),
))


_register(QuerySpec(
    name="a_cube",
    survey="A9 (generalized): CUBE full-lattice multi-grain with GROUPING flags",
    build=q_a_cube,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
))


def q_x_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Containment (overlap-coefficient) near-dup scoring: intersection /
    min set size. Catches doc-inside-doc duplication — a page embedded in
    a larger page scores ~1.0 here but falls under a Jaccard threshold
    because the union denominator grows with the big doc. Runs with the
    default doc-frequency cap (the 100 TB fan-out bound — the uncapped
    exact baseline is represented by x_dedup_jaccard); the oracle
    recomputes the capped shingle universe, same as x_dedup_jaccard_capped.
    """
    docs = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, shingle_n=3,
        max_doc_freq=5, metric="containment",
    )


_register(QuerySpec(
    name="x_dedup_containment",
    survey="north-star: containment/overlap-coefficient near-dup (doc-inside-doc)",
    build=q_x_dedup_containment,
    oracle="""
        WITH toks AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM toks,
                 UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), capped AS (
          SELECT id, sh FROM (
            SELECT id, sh, COUNT(*) OVER (PARTITION BY sh) AS dfreq
            FROM shingles
          ) WHERE dfreq <= 5
        ), sizes AS (
          SELECT id, COUNT(*) AS n_shingles FROM capped GROUP BY 1
        ), pairs AS (
          SELECT x.id AS id_a, y.id AS id_b, COUNT(*) AS n_common
          FROM capped x JOIN capped y ON x.sh = y.sh AND x.id < y.id
          GROUP BY 1, 2
        )
        SELECT p.id_a, p.id_b,
               ROUND(p.n_common / least(sa.n_shingles, sb.n_shingles), 4)
                 AS containment
        FROM pairs p
        JOIN sizes sa ON p.id_a = sa.id
        JOIN sizes sb ON p.id_b = sb.id
        WHERE p.n_common / least(sa.n_shingles, sb.n_shingles) >= 0.5
    """,
    tags=("dedup", "containment", "scale"),
))


def q_x_sample_interleave(spark: SparkSession, sf: str) -> DataFrame:
    """Sharded source-interleaved training order: positions within each
    shard cycle through sources (round r of every per-source stream before
    round r+1) instead of long same-source runs. One window per
    (shard, source) + one per shard — shards stay independent, no global
    single-partition sort.
    """
    docs = _t(spark, sf, "documents")
    return interleave_sources(docs, "doc_id", "source", n_shards=8).select(
        F.col("shard").cast("int").alias("shard"),
        "pos",
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
    )


_register(QuerySpec(
    name="x_sample_interleave",
    survey="north-star: deterministic source-interleaved training order",
    build=q_x_sample_interleave,
    oracle="""
        WITH base AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                 CAST((CAST('0x' || substr(md5('interleave|' ||
                        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000)
                      % 8 AS INT) AS shard,
                 md5('interleave|' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY shard, source ORDER BY h, doc_id) AS rnk
          FROM base
        )
        SELECT shard,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY shard ORDER BY rnk, source, doc_id) AS INT)
                 AS pos,
               doc_id, source
        FROM ranked
    """,
    tags=("sampling", "interleave"),
))


_BM25_TERMS = ["merge", "vector", "stream"]


def q_x_text_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 retrieval for a fixed 3-term query. Per-term tf and doc
    length fold row-locally in the scan stage; N/avgdl/df partial-combine
    to ONE broadcast row; top-k is TakeOrderedAndProject. Nothing
    vocabulary- or corpus-sized ever shuffles.
    """
    docs = _t(spark, sf, "documents")
    return bm25_topk(docs, "doc_id", "text", _BM25_TERMS, k=20)


_register(QuerySpec(
    name="x_text_bm25",
    survey="north-star: BM25 relevance retrieval over the corpus",
    bench=True,
    build=q_x_text_bm25,
    oracle="""
        WITH base AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ), per AS (
          SELECT id,
                 CAST(len(toks) AS BIGINT) AS dl,
                 CAST(len(list_filter(toks, x -> x = 'merge')) AS BIGINT)
                   AS tf_0,
                 CAST(len(list_filter(toks, x -> x = 'vector')) AS BIGINT)
                   AS tf_1,
                 CAST(len(list_filter(toks, x -> x = 'stream')) AS BIGINT)
                   AS tf_2
          FROM base
        ), stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(dl) AS BIGINT) AS total_dl,
                 CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df_0,
                 CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df_1,
                 CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS df_2
          FROM per
        ), scored AS (
          SELECT id AS doc_id, dl,
                 ROUND(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_0 AS DOUBLE)
                             + 0.5) / (CAST(df_0 AS DOUBLE) + 0.5))
                     * CAST(tf_0 AS DOUBLE) * 2.2
                     / (CAST(tf_0 AS DOUBLE)
                        + 1.2 * (1.0 - 0.75 + 0.75
                                 * (CAST(dl * n_docs AS DOUBLE)
                                    / CAST(total_dl AS DOUBLE))))
                   + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_1 AS DOUBLE)
                             + 0.5) / (CAST(df_1 AS DOUBLE) + 0.5))
                     * CAST(tf_1 AS DOUBLE) * 2.2
                     / (CAST(tf_1 AS DOUBLE)
                        + 1.2 * (1.0 - 0.75 + 0.75
                                 * (CAST(dl * n_docs AS DOUBLE)
                                    / CAST(total_dl AS DOUBLE))))
                   + ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_2 AS DOUBLE)
                             + 0.5) / (CAST(df_2 AS DOUBLE) + 0.5))
                     * CAST(tf_2 AS DOUBLE) * 2.2
                     / (CAST(tf_2 AS DOUBLE)
                        + 1.2 * (1.0 - 0.75 + 0.75
                                 * (CAST(dl * n_docs AS DOUBLE)
                                    / CAST(total_dl AS DOUBLE)))),
                   4) AS score
          FROM per, stats
        )
        SELECT doc_id, dl, score FROM scored
        WHERE score > 0
        ORDER BY score DESC, doc_id ASC
        LIMIT 20
    """,
    tags=("text", "retrieval", "bm25"),
))


def q_x_embed_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension embedding QA stats. posexplode rows partial-combine to
    dimension grain map-side, so the single exchange carries ~dims x
    partitions rows; float sums are quantized to exact longs (fold-order
    free) with one final division per stat.
    """
    emb = _t(spark, sf, "embeddings")
    return embedding_dim_stats(emb, "embedding")


_register(QuerySpec(
    name="x_embed_stats",
    survey="north-star: embedding-column QA statistics",
    build=q_x_embed_stats,
    oracle="""
        WITH ex AS (
          SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings,
               UNNEST(generate_series(1, len(embedding))) AS t(i)
        )
        SELECT CAST(dim AS INT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(least(greatest(floor(v * 1048576.0),
                        -1099511627776.0), 1099511627776.0) AS BIGINT))
                    AS DOUBLE)
                 / (1048576.0 * COUNT(*)) AS mean,
               CAST(SUM(CAST(least(greatest(floor(v * v * 1048576.0),
                        -1099511627776.0), 1099511627776.0) AS BIGINT))
                    AS DOUBLE)
                 / (1048576.0 * COUNT(*)) AS mean_sq,
               MIN(v) AS min_v,
               MAX(v) AS max_v
        FROM ex GROUP BY 1
    """,
    tags=("similarity", "stats", "multimodal"),
))


def q_x_corpus_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source length-distribution drift vs the corpus (TVD + chi2).
    Raw rows reduce to (source, bin) grain in one exchange; the comparison
    grid is a broadcast product of two post-aggregate frames; per-bin
    contributions quantize to exact longs so the bin fold order cannot
    change the hash.
    """
    docs = _t(spark, sf, "documents")
    return source_drift_report(docs, "source", "n_chars", bin_width=100)


_register(QuerySpec(
    name="x_corpus_drift",
    survey="north-star: per-source distribution-drift monitoring",
    build=q_x_corpus_drift,
    oracle="""
        WITH b AS (
          SELECT source,
                 CAST((n_chars // 100) * 100 AS BIGINT) AS bin
          FROM documents
        ), sb AS (
          SELECT source, bin, COUNT(*) AS n_sb FROM b GROUP BY 1, 2
        ), s_tot AS (
          SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1
        ), c_bin AS (
          SELECT bin, CAST(SUM(n_sb) AS BIGINT) AS n_b FROM sb GROUP BY 1
        ), c_tot AS (
          SELECT CAST(SUM(n_b) AS BIGINT) AS n_c FROM c_bin
        ), grid AS (
          SELECT st.source, st.n_s,
                 CAST(COALESCE(x.n_sb, 0) AS DOUBLE)
                   / CAST(st.n_s AS DOUBLE) AS p_s,
                 CAST(cb.n_b AS DOUBLE) / CAST(ct.n_c AS DOUBLE) AS p_c
          FROM s_tot st
          CROSS JOIN c_bin cb
          CROSS JOIN c_tot ct
          LEFT JOIN sb x ON x.source IS NOT DISTINCT FROM st.source
                        AND x.bin IS NOT DISTINCT FROM cb.bin
        )
        SELECT source,
               CAST(MAX(n_s) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(floor(abs(p_s - p_c) * 1000000000.0)
                             AS BIGINT)) AS DOUBLE)
                 / 2000000000.0 AS tvd,
               CAST(SUM(CAST(floor((p_s - p_c) * (p_s - p_c) / p_c
                                   * 1000000000.0) AS BIGINT)) AS DOUBLE)
                 / 1000000000.0 AS chi2
        FROM grid GROUP BY 1
    """,
    tags=("text", "stats", "monitoring"),
))


def q_x_corpus_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot-version audit: two deterministic corpus versions derived
    from ``documents`` (v1 drops doc_id%10==0, v2 drops doc_id%10==1 and
    rewrites doc_id%7==0 texts), diffed to per-source added/removed/
    changed/unchanged counts. Digests cross the join, never documents.
    """
    docs = _t(spark, sf, "documents")
    v1 = docs.filter(F.col("doc_id") % 10 != 0)
    v2 = docs.filter(F.col("doc_id") % 10 != 1).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_snapshot_diff(v1, v2, "doc_id", "text")


_register(QuerySpec(
    name="x_corpus_diff",
    survey="north-star: dataset-version snapshot diff audit",
    bench=True,
    build=q_x_corpus_diff,
    oracle="""
        WITH v1 AS (
          SELECT CAST(doc_id AS BIGINT) AS id, source, md5(text) AS h
          FROM documents WHERE doc_id % 10 <> 0
        ), v2 AS (
          SELECT CAST(doc_id AS BIGINT) AS id, source,
                 md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                          ELSE text END) AS h
          FROM documents WHERE doc_id % 10 <> 1
        ), j AS (
          SELECT COALESCE(v2.source, v1.source) AS source,
                 CASE WHEN v1.id IS NULL THEN 'added'
                      WHEN v2.id IS NULL THEN 'removed'
                      WHEN v1.h IS DISTINCT FROM v2.h THEN 'changed'
                      ELSE 'unchanged' END AS st
          FROM v1 FULL OUTER JOIN v2 ON v1.id = v2.id
        )
        SELECT source,
               CAST(SUM(CASE WHEN st = 'added' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_added,
               CAST(SUM(CASE WHEN st = 'removed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(SUM(CASE WHEN st = 'changed' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed,
               CAST(SUM(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unchanged
        FROM j GROUP BY 1
    """,
    tags=("text", "versioning", "audit"),
))


def q_x_curation_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """The COMPLETE training-data curation DAG chained on one engine, one
    entry — the ``x_curation_funnel`` pattern widened to the full flow:

      ingest -> NFC canonicalize -> quality gate -> near-dup dedup
      (MinHash-LSH bands -> Jaccard verify -> connected components)
      -> benchmark decontamination (8-gram) -> leakage-safe group split
      -> fixed-budget sequence packing

    Emits one audit row per stage (stage_no, stage, n_rows) — the
    dataset-card trail a production curation run ships. Every stage is
    the engine's first-class operator applied to the PREVIOUS stage's
    survivors: canonicalized text feeds the quality expressions, quality
    survivors feed shingling, only near-dup winners are decontaminated,
    only clean docs are split, and only the train split is packed.

    Scale shape: the corpus is scanned once into a persisted flag frame
    (NFC + quality + split are scan-stage projections over it); dedup
    adds the banded-candidate exchanges bounded exactly as
    x_dedup_pipeline; decontamination broadcasts the fixed-size
    benchmark gram set; the split is a zero-shuffle hash expression;
    packing's single exchange feeds the (lang, shard)-bounded window.
    Stage counts fold as conditional sums over one frame — never one
    re-derived count() per stage (the 4-scan trap the funnel docstring
    records). The distinct-hash stage and the distinct-sequence stage
    run as SEPARATE one-row aggregates unioned in (mixing
    COUNT(DISTINCT) into the plain-sum groupBy would Expand-duplicate
    every input row).
    """
    docs = _t(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") >= 100)
    bench = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        nfc_normalize_text(F.col("text")).alias("text"),
    )
    base = hash_split(
        corpus.select(
            F.col("doc_id").cast("long").alias("id"),
            nfc_normalize_text(F.col("text")).alias("ntext"),
            "lang",
            "source",
        ),
        "source",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    ).withColumn(
        "q4", (quality_score(F.col("ntext")) * 4).cast("long")
    ).persist()

    qdocs = base.filter(F.col("q4") >= 3).select("id", "ntext")
    kept = (
        near_dup_dedup(
            qdocs, "id", "ntext", threshold=0.8,
            max_doc_freq=None, max_bucket_size=None,
        )
        .select("id")
        .withColumn("__s", F.lit(1))
        .persist()
    )
    hits = (
        ngram_contamination(
            qdocs.join(kept.select("id"), "id", "semi").select(
                F.col("id").alias("doc_id"), F.col("ntext").alias("text")
            ),
            bench,
            "doc_id",
            "text",
            n=8,
        )
        .select("id")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    flags = (
        base.join(kept, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            "lang",
            "ntext",
            (F.col("q4") >= 3).alias("__q"),
            F.col("__s").isNotNull().alias("__k"),
            (F.col("__s").isNotNull() & F.col("__c").isNull()).alias("__cl"),
            (
                F.col("__s").isNotNull()
                & F.col("__c").isNull()
                & (F.col("split") == "train")
            ).alias("__tr"),
        )
        .persist()
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum(F.col("__q").cast("long")).alias("n3"),
        F.sum(F.col("__k").cast("long")).alias("n4"),
        F.sum(F.col("__cl").cast("long")).alias("n5"),
        F.sum(F.col("__tr").cast("long")).alias("n6"),
    ).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("stage_no"),
                        F.lit(label).alias("stage"),
                        F.col(f"n{i}").alias("n_rows"),
                    )
                    for i, label in [
                        (1, "ingested"),
                        (3, "quality_ok"),
                        (4, "near_deduped"),
                        (5, "decontaminated"),
                        (6, "train_split"),
                    ]
                ]
            )
        ).alias("__s")
    ).select("__s.*")
    canon = flags.agg(
        F.count_distinct(F.md5("ntext")).alias("n_rows")
    ).select(
        F.lit(2).cast("int").alias("stage_no"),
        F.lit("canonical_distinct").alias("stage"),
        "n_rows",
    )
    packed = pack_sequences(
        flags.filter("__tr").select("id", "lang", "ntext"),
        "id",
        "lang",
        token_count_ws(F.col("ntext")),
        budget=256,
        n_shards=4,
    )
    n_seq = packed.agg(
        F.count_distinct(F.struct("lang", "shard", "seq_bin")).alias("n_rows")
    ).select(
        F.lit(7).cast("int").alias("stage_no"),
        F.lit("packed_sequences").alias("stage"),
        "n_rows",
    )
    return counts.unionByName(canon).unionByName(n_seq)


# the quality-gate SQL applied to the NFC-normalized column: the snippet
# references the raw column only as the bare word `text`, so a word-boundary
# substitution is exact (plain .replace would also corrupt `ntext)` matches)
_Q4_NTEXT_SQL = __import__("re").sub(r"\btext\b", "ntext", _Q4_SQL)


_register(QuerySpec(
    name="x_curation_e2e",
    survey="north-star: full curation DAG (ingest->NFC->quality->dedup->decontaminate->split->pack)",
    build=q_x_curation_e2e,
    oracle=f"""
        WITH RECURSIVE raw AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 nfc_normalize(text) AS ntext, lang, source
          FROM documents WHERE doc_id >= 100
        ), base AS (
          SELECT id, ntext, lang, source,
                 {_Q4_NTEXT_SQL} AS q4,
                 CAST('0x' || substr(md5('split|' || source), 1, 8)
                      AS BIGINT) % 10000 AS b
          FROM raw
        ), qd AS (
          SELECT id, ntext FROM base WHERE q4 >= 3
        ), tk AS (
          SELECT id, list_filter(string_split_regex(lower(ntext),
                                 '[^a-z0-9]+'), t -> t <> '') AS toks
          FROM qd
        ), shingles AS (
          SELECT DISTINCT id, sh FROM (
            SELECT id, array_to_string(toks[i : i + 2], ' ') AS sh
            FROM tk, UNNEST(range(1, greatest(len(toks) - 2, 1) + 1)) AS u(i)
          )
        ), salted AS (
          SELECT id, hash_idx, md5(CAST(hash_idx AS VARCHAR) || '|' || sh) AS h
          FROM shingles, UNNEST(range(0, 8)) AS s(hash_idx)
        ), sigs AS (
          SELECT id, hash_idx, MIN(h) AS min_hash FROM salted GROUP BY 1, 2
        ), bands AS (
          SELECT id, CAST(hash_idx // 2 AS INT) AS band,
                 string_agg(CAST(hash_idx AS VARCHAR) || ':' || min_hash, '_'
                            ORDER BY hash_idx) AS band_key
          FROM sigs GROUP BY 1, 2
        ), cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
        ), sizes AS (
          SELECT id, COUNT(*) AS n FROM shingles GROUP BY 1
        ), inter AS (
          SELECT c.id_a, c.id_b, COUNT(*) AS n_common
          FROM cand c
          JOIN shingles sa ON sa.id = c.id_a
          JOIN shingles sb ON sb.id = c.id_b AND sb.sh = sa.sh
          GROUP BY 1, 2
        ), verified AS (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sizes za ON za.id = i.id_a
          JOIN sizes zb ON zb.id = i.id_b
          WHERE ROUND(i.n_common / (za.n + zb.n - i.n_common), 4) >= 0.8
        ), edges AS (
          SELECT id_a AS src, id_b AS dst FROM verified
          UNION
          SELECT id_b, id_a FROM verified
        ), reach(id, lab) AS (
          SELECT DISTINCT src, src FROM edges
          UNION
          SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
        ), losers AS (
          SELECT id FROM (SELECT id, MIN(lab) AS component FROM reach
                          GROUP BY id)
          WHERE id <> component
        ), kept AS (
          SELECT qd.id, qd.ntext FROM qd
          LEFT JOIN losers l ON qd.id = l.id WHERE l.id IS NULL
        ), btk AS (
          SELECT CAST(doc_id AS BIGINT) AS id,
                 list_filter(string_split_regex(lower(nfc_normalize(text)),
                             '[^a-z0-9]+'), t -> t <> '') AS toks
          FROM documents WHERE doc_id < 100
        ), bgrams AS (
          SELECT DISTINCT array_to_string(toks[i : i + 7], ' ') AS g
          FROM btk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), ktk AS (
          SELECT id, list_filter(string_split_regex(lower(ntext),
                                 '[^a-z0-9]+'), t -> t <> '') AS toks
          FROM kept
        ), kgrams AS (
          SELECT DISTINCT id, array_to_string(toks[i : i + 7], ' ') AS g
          FROM ktk, UNNEST(range(1, greatest(len(toks) - 7, 1) + 1)) AS u(i)
        ), contaminated AS (
          SELECT DISTINCT id FROM kgrams JOIN bgrams USING (g)
        ), clean AS (
          SELECT k.id FROM kept k
          LEFT JOIN contaminated c ON k.id = c.id WHERE c.id IS NULL
        ), train AS (
          SELECT b.id, b.lang, b.ntext FROM base b
          JOIN clean USING (id) WHERE b.b < 8000
        ), ptk AS (
          SELECT id, lang, CAST(id % 4 AS INT) AS shard,
                 CAST(len(list_filter(string_split_regex(ntext, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens
          FROM train
        ), packed AS (
          SELECT lang, shard,
                 CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang, shard
                                                 ORDER BY id) - n_tokens)
                            / 256.0) AS BIGINT) AS seq_bin
          FROM ptk
        )
        SELECT 1 AS stage_no, 'ingested' AS stage,
               COUNT(*) AS n_rows FROM base
        UNION ALL
        SELECT 2, 'canonical_distinct', COUNT(DISTINCT md5(ntext)) FROM base
        UNION ALL
        SELECT 3, 'quality_ok', COUNT(*) FROM qd
        UNION ALL
        SELECT 4, 'near_deduped', COUNT(*) FROM kept
        UNION ALL
        SELECT 5, 'decontaminated', COUNT(*) FROM clean
        UNION ALL
        SELECT 6, 'train_split', COUNT(*) FROM train
        UNION ALL
        SELECT 7, 'packed_sequences',
               COUNT(DISTINCT (lang, shard, seq_bin)) FROM packed
    """,
    tags=("text", "pipeline", "curation", "e2e"),
))


# The driver verifies the FIRST 50 entries of ``queries()`` each round. To
# keep every catalog entry driver-verified over time, ``queries()`` orders by
# LEAST-RECENTLY-GREEN: entries with no fully hash-green driver row ever
# (new entries, changed/red entries, no-oracle rows) come first, then entries
# ordered by the round of their most recent hash_match=true row (oldest
# first), registration order as the tiebreak. The round history is read from
# the repo-root CORRECTNESS_r*.json files at import time, so the window
# rotates automatically every round and no entry goes unverified for long.
def _last_green_round() -> dict:
    """name -> latest round number with a hash_match=true driver row."""
    import glob
    import json
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out: dict = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match") is True:
                out[name] = max(out.get(name, 0), rnd)
    return out


def _verify_ordered() -> list[QuerySpec]:
    """Catalog sorted least-recently-green-first for the driver's window."""
    last = _last_green_round()
    order = {spec.name: i for i, spec in enumerate(CATALOG)}
    return sorted(
        CATALOG, key=lambda s: (last.get(s.name, -1), order[s.name])
    )


def queries() -> dict:
    """name -> builder, the __spark_entry__ contract."""
    return {spec.name: spec.build for spec in _verify_ordered()}


def oracle_sql() -> dict:
    """name -> DuckDB SQL for every oracle-checkable spec."""
    return {spec.name: spec.oracle for spec in _verify_ordered()
            if spec.oracle is not None}
