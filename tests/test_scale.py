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


def test_hash_prefilter_join_matches_plain_semi_and_anti(spark, sf_dir):
    """Prefilter semi/anti results must be EXACTLY the plain join's — the
    bucket filter only prunes definite misses, never changes membership —
    and the prefilter stage must be a broadcast join with the fact side
    unshuffled (only the bucket-distinct pays an exchange)."""
    from automotive_data_pipeline_demo_spark.operators.scale import (
        hash_prefilter_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT' AND o_totalprice > 150000"
    )
    for how in ("left_semi", "left_anti"):
        out = hash_prefilter_join(
            li, keys, "l_orderkey", "o_orderkey", how=how, n_buckets=1 << 16
        )
        ref = li.join(keys, li.l_orderkey == keys.o_orderkey, how)
        cols = ["l_orderkey", "l_linenumber"]
        assert out.select(cols).exceptAll(ref.select(cols)).count() == 0, how
        assert ref.select(cols).exceptAll(out.select(cols)).count() == 0, how

    semi = hash_prefilter_join(
        li, keys, "l_orderkey", "o_orderkey", how="left_semi", n_buckets=1 << 16
    )
    plan = _plan(semi)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the fact table itself must not shuffle for the prefilter: the only
    # hashpartitioning exchange allowed up front is the bucket distinct's
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_hash_prefilter_join_rejects_other_modes(spark, sf_dir):
    import pytest

    from automotive_data_pipeline_demo_spark.operators.scale import (
        hash_prefilter_join,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for bad in ("inner", "left", "right"):
        with pytest.raises(ValueError, match="hash_prefilter_join supports"):
            hash_prefilter_join(li, keys, "l_orderkey", "o_orderkey", how=bad)


def test_write_range_sorted_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Each output file must cover a disjoint sort-key range — that is the
    property that makes row-group min/max stats skip data at the scan."""
    import glob

    from automotive_data_pipeline_demo_spark.operators.scale import (
        write_range_sorted,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "orders_sorted")
    write_range_sorted(orders, out, ["o_orderdate"], n_files=8)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        r = (
            spark.read.parquet(f)
            .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
            .collect()[0]
        )
        ranges.append((r["lo"], r["hi"]))
    assert len(ranges) > 1
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, (hi_prev, lo_next)
    # and the layout loses no rows
    assert spark.read.parquet(out).count() == orders.count()


def test_write_zorder_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order's reason to exist: per-file min/max spans are tight on BOTH
    interleaved keys, where a single-key sort leaves the second key's
    per-file span at (nearly) the full global span."""
    import glob

    from automotive_data_pipeline_demo_spark.operators.layout import write_zorder
    from automotive_data_pipeline_demo_spark.operators.scale import (
        write_range_sorted,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("long").alias("o_day"),
    )

    def mean_spans(path):
        spans = {"o_custkey": [], "o_day": []}
        for f in glob.glob(f"{path}/part-*.parquet"):
            row = (
                spark.read.parquet(f)
                .agg(
                    (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
                    (F.max("o_day") - F.min("o_day")).alias("dy"),
                )
                .collect()[0]
            )
            spans["o_custkey"].append(row["ck"])
            spans["o_day"].append(row["dy"])
        return {k: sum(v) / len(v) for k, v in spans.items()}

    glob_row = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("o_day") - F.min("o_day")).alias("dy"),
    ).collect()[0]

    z_out = str(tmp_path / "orders_z")
    s_out = str(tmp_path / "orders_s")
    write_zorder(orders, z_out, ["o_custkey", "o_day"], n_files=16)
    write_range_sorted(orders, s_out, ["o_custkey"], n_files=16)

    z, s = mean_spans(z_out), mean_spans(s_out)
    # single-key sort: second dimension is unclustered (span ~= global)
    assert s["o_day"] > 0.9 * glob_row["dy"]
    # z-order: BOTH dimensions clustered well below the global span
    assert z["o_custkey"] < 0.5 * glob_row["ck"], z
    assert z["o_day"] < 0.5 * glob_row["dy"], z
    # and no rows lost
    assert spark.read.parquet(z_out).count() == orders.count()


def test_global_sequence_is_dense_and_deterministic(spark):
    """The distributed numbering is a dense 1..n permutation in key order,
    and two independent invocations agree even though range boundaries are
    sampled (the persist pins one sampling per invocation; key order plus
    per-partition counts make the RESULT boundary-independent)."""
    from automotive_data_pipeline_demo_spark.operators.scale import (
        global_sequence,
    )

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k")  # permuted unique keys
    )
    a = global_sequence(df, ["k"], num_partitions=7)
    rows = sorted((r["k"], r["seq"]) for r in a.collect())
    assert rows == [(k, k + 1) for k in range(1000)]
    b = global_sequence(df, ["k"], num_partitions=3)
    assert sorted((r["k"], r["seq"]) for r in b.collect()) == rows
