"""EP1 -> EP2 -> EP3 composition: one flow from raw DMS-style CSV through the
lake MERGE, the six-view DAG, and exactly-once activation — the reference's
three entry points (SURVEY §3) chained on one engine."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.plans.etl import run_vehicle_sales_etl
from automotive_data_pipeline_demo_spark.plans.views import build_view_dag
from automotive_data_pipeline_demo_spark.sources.sinks import write_jsonl_events
from automotive_data_pipeline_demo_spark.streaming.activation import (
    emit_new_events,
    mark_processed,
)
from tests.fixtures import write_fixtures

AS_OF = "2025-06-01"


def test_pipeline_end_to_end(spark, tmp_path):
    paths = write_fixtures(str(tmp_path))

    # EP1: DMS export = stringly CSV; round it through the typed ETL + MERGE
    sales_pq = spark.read.parquet(paths["vehicle_sales"])
    csv_dir = str(tmp_path / "dms_export")
    sales_pq.select(
        [F.col(c).cast("string").alias(c) for c in sales_pq.columns]
    ).coalesce(1).write.option("header", True).mode("overwrite").csv(csv_dir)
    lake = str(tmp_path / "lake")
    typed = run_vehicle_sales_etl(spark, csv_dir, lake)
    n_valid = sales_pq.filter(
        F.col("vin").isNotNull()
        & F.col("custno").isNotNull()
        & F.col("salesdate").isNotNull()
    ).count()
    assert typed.count() == n_valid  # P2 quality gate, nothing else lost

    # EP2: the six-view DAG over warehouse tables
    lake_df = spark.read.parquet(lake)
    cm = spark.read.parquet(paths["customer_master"])
    views = build_view_dag(cm, lake_df, AS_OF)
    validated = views["validated_vehicle_sales"].cache()
    n_validated = validated.count()
    assert n_validated > 0
    # W2 dedup: deal numbers unique after the view
    assert validated.select("deal_number").distinct().count() == n_validated

    # EP3: exactly-once activation off the validated view
    state = str(tmp_path / "state")
    out = str(tmp_path / "events_jsonl")
    events = emit_new_events(spark, validated, state).cache()
    n_events = events.count()
    assert 0 < n_events <= n_validated
    write_jsonl_events(events, out)
    mark_processed(spark, events, state)

    # delivered JSON is well-formed and keyed
    lines = [
        json.loads(r["value"])
        for r in spark.read.text(out).collect()
    ]
    assert len(lines) == n_events
    assert all(l["type"] == "track" and l["messageId"].startswith("vp_") for l in lines)
    assert len({l["messageId"] for l in lines}) == n_events
    # every event's user exists in customer_profiles (cross-layer integrity)
    profile_users = {
        r["user_id"] for r in views["customer_profiles"].select("user_id").collect()
    }
    assert {l["userId"] for l in lines} <= profile_users

    # re-run: state makes the same window emit ZERO (ST2)
    again = emit_new_events(spark, validated, state)
    assert again.count() == 0

    # late/backfill batch (ST3): widen the window -> only genuinely new rows
    assert emit_new_events(
        spark, validated, state, start_date="1990-01-01"
    ).count() == 0
