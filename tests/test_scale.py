"""Scale-posture tests: bucketed joins are exchange-free, salting preserves
results while splitting hot keys. These assert PLAN properties, not just
values — the point is the 100 TB shape, verified at test scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators.scale import (
    bucketed_join,
    salted_groupby_sum,
    salted_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    # managed tables land in the session's warehouse dir; DROP TABLE below
    # removes the files again
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"),
        "b_orders", ["custkey"], n_buckets=8, sort_cols=["o_orderdate"],
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "custkey"),
        "b_customer", ["custkey"], n_buckets=8,
    )
    # disable auto-broadcast so the test proves bucketing (not broadcast)
    # removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", ["custkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is the plain join's result
        expected = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_groupby_sum_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: r["s"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: r["sum_l_quantity"]
        for r in salted_groupby_sum(
            li.withColumn("l_quantity", F.col("l_quantity").cast("decimal(18,2)")),
            ["l_returnflag"], ["l_quantity"], n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    plain = orders.join(customer, "custkey").count()
    salted = salted_join(orders, customer, "custkey", n_salts=4)
    assert salted.count() == plain
    # the join key includes the salt: hot custkeys spread over 4 partitions
    assert "__salt" not in salted.columns


def test_salted_join_rejects_right_and_full(spark, sf_dir):
    """The small side is replicated per salt: right/full would keep each
    unmatched small-side row n_salts times, so those modes must raise."""
    import pytest

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, customer, "custkey", n_salts=4, how=bad)
