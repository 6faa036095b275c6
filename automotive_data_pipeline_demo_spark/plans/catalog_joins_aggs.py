"""Joins + aggregation (SURVEY §2.3 / §2.4).

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


