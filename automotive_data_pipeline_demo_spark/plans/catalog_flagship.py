"""Flagship: the customer-360 segmentation pipeline.

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


