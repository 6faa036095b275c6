"""Windows / sorts / set ops (SURVEY §2.5 / §2.6 / §2.7).

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
    """U1: SELECT DISTINCT (README.md:170-176), merged with the former
    u3_intersect_except entry (r8 window-capacity fold — one slot, full
    oracle coverage of all three set ops): the INTERSECT/EXCEPT cohorts
    now ride as tagged rows at FULL row grain (the old u3 only hashed the
    two cohort counts; this hashes every member).

    Cohorts: ``priority:<p>`` = the U1 distinct (custkey, priority) pairs;
    ``retained`` = customers active in both 1995 and 1996 (INTERSECT);
    ``churned`` = active in 1995 but not 1996 (EXCEPT DISTINCT).
    """
    o = _t(spark, sf, "orders")
    pairs = (
        o.select("o_custkey", "o_orderpriority")
        .distinct()
        .select(
            F.concat(F.lit("priority:"), F.col("o_orderpriority")).alias("cohort"),
            "o_custkey",
        )
    )
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    both = y95.intersect(y96).select(F.lit("retained").alias("cohort"), "o_custkey")
    churned = y95.subtract(y96).select(  # EXCEPT DISTINCT
        F.lit("churned").alias("cohort"), "o_custkey"
    )
    return pairs.unionByName(both).unionByName(churned)


_register(QuerySpec(
    name="u1_distinct",
    survey="U1 (+INTERSECT/EXCEPT, folded from u3_intersect_except r8)",
    build=q_u1_distinct,
    oracle="""
        SELECT 'priority:' || o_orderpriority AS cohort, o_custkey
        FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
        UNION ALL
        SELECT 'retained' AS cohort, o_custkey FROM (
          SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
          INTERSECT
          SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
        UNION ALL
        SELECT 'churned' AS cohort, o_custkey FROM (
          SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
          EXCEPT
          SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
    """,
    tags=("distinct", "setop"),
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


# u3_intersect_except was folded into u1_distinct above (r8): same set-op
# semantics at FULL row grain, one driver-window slot instead of two.


