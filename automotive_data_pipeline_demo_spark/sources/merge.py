"""MERGE-style upsert over parquet (no Delta in this image).

Reference parity: S5/J7 — the Glue job stages new rows into a temp table,
then ``DELETE ... USING`` on a 4-part key and ``INSERT ... SELECT``
(``scripts/glue_vehicle_sales_etl.py:289-392``). The relational equivalent is
``MERGE INTO target USING updates ON keys WHEN MATCHED UPDATE WHEN NOT
MATCHED INSERT``; with plain parquet we express it as

    kept   = target LEFT ANTI JOIN updates ON keys
    result = kept UNION BY NAME updates(deduped-latest)

Scale notes: rewriting 100 TB per daily batch is unacceptable — callers pass
``partition_cols`` + ``touched_partitions`` pruning so only the partitions
containing updated keys are rewritten (dynamic partition overwrite bounds the
write amplification, mirroring the reference's daily-partition lake layout).
Updates are deduped to latest-per-key first so re-delivered files are
idempotent (ST1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.operators.dedup import dedup_latest


def merge_upsert_frames(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] = (),
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Pure-DataFrame MERGE: latest update per key replaces the target row."""
    if order_by:
        updates = dedup_latest(updates, keys, order_by, tiebreakers)
    else:
        updates = updates.dropDuplicates(list(keys))
    kept = target.join(updates.select(*keys), list(keys), "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] = (),
    partition_cols: Sequence[str] = (),
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_path``.

    With ``partition_cols``, only partitions present in ``updates`` are read
    and rewritten (dynamic overwrite); without, the whole table is rewritten
    (fine for dims, wrong for facts — pass partitions for facts).
    """
    if order_by:
        updates = dedup_latest(updates, keys, order_by)
    else:
        updates = updates.dropDuplicates(list(keys))

    try:
        target = spark.read.parquet(target_path)
        exists = True
    except Exception:
        exists = False

    if not exists:
        writer = updates.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(target_path)
        return

    if partition_cols:
        # prune target read to touched partitions, bound write amplification
        touched = [
            r.asDict() for r in updates.select(*partition_cols).distinct().collect()
        ]
        pred: Column = F.lit(False)
        for part in touched:
            clause = F.lit(True)
            for c, v in part.items():
                clause = clause & (F.col(c) == F.lit(v))
            pred = pred | clause
        target = target.filter(pred)

    merged = merge_upsert_frames(target, updates, keys)  # updates already deduped
    # materialize before overwriting the files we read from
    merged_rows = merged.cache()
    merged_rows.count()
    writer = merged_rows.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(target_path)
    merged_rows.unpersist()
