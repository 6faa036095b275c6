"""Streaming upsert: foreachBatch MERGE into a parquet table (ST1).

Reference parity: the Glue job's staged DELETE USING + INSERT SELECT
(scripts/glue_vehicle_sales_etl.py:289-392) ran once per daily batch; the
streaming twin applies the same merge per micro-batch via foreachBatch.
Idempotence: updates are deduped latest-per-key before merging, so a
re-delivered batch leaves the table unchanged (the ST1 test).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from automotive_data_pipeline_demo_spark.sources.merge import merge_upsert


def streaming_upsert(
    updates_stream: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_by: Sequence[str] = (),
    partition_cols: Sequence[str] = (),
    checkpoint: str | None = None,
    query_name: str = "streaming_upsert",
):
    """writeStream.foreachBatch wrapper around the batch MERGE."""

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        merge_upsert(
            spark, target_path, batch_df, keys,
            order_by=order_by, partition_cols=partition_cols,
        )

    writer = (
        updates_stream.writeStream.outputMode("update")
        .queryName(query_name)
        .foreachBatch(apply_batch)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
