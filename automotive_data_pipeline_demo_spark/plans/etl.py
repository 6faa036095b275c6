"""EP1: the daily batch ETL as one Catalyst pipeline.

Reference parity (scripts/glue_vehicle_sales_etl.py): CSV scan (S1) ->
SQL cleaning pass over a temp view (P1/P2, :80-176) -> explicit cast
projection (P3, :190-266) -> warehouse upsert (S5, :289-392). The
reference crossed four engines (Glue DynamicFrame -> Spark -> S3 staging ->
Redshift); here the whole chain is one logical plan ending in a partitioned
parquet MERGE — the only shuffle is the merge join.

``sql_over_frames`` reproduces the reference's ``sparkSqlQuery`` helper
(UD5, :28-36): frames in -> SQL -> frame out, the engine's escape hatch.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.sources.merge import merge_upsert
from automotive_data_pipeline_demo_spark.sources.readers import read_csv_typed

# The cast map distilled from ApplyMapping (glue_vehicle_sales_etl.py:190-266):
# IDs stay strings (leading zeros), money is decimal, dates are timestamps.
VEHICLE_SALES_CAST: Mapping[str, str] = {
    "dealno": "string",
    "custno": "string",
    "vin": "string",
    "stockno": "string",
    "branch": "string",
    "year": "string",
    "makename": "string",
    "modelname": "string",
    "bodystyle": "string",
    "color": "string",
    "modeltype": "string",
    "vehiclemileage": "decimal(18,2)",
    "saletype": "string",
    "dealtype": "string",
    "cashprice": "decimal(18,2)",
    "costprice": "decimal(18,2)",
    "outthedoorprice": "decimal(18,2)",
    "totalgross": "decimal(18,2)",
    "frontgross": "decimal(18,2)",
    "backgross": "decimal(18,2)",
    "customercashdown": "decimal(18,2)",
    "totaldown": "decimal(18,2)",
    "financesource": "string",
    "financeamt": "decimal(18,2)",
    "apr": "decimal(18,2)",
    "term": "decimal(18,0)",
    "paymentamt": "decimal(18,2)",
    "trade1vin": "string",
    "trade1acv": "decimal(18,2)",
    "trade1payoff": "decimal(18,2)",
    "nettrade1": "decimal(18,2)",
    "trade1year": "string",
    "trade1makename": "string",
    "trade1modelname": "string",
    "leasetype": "string",
    "leasepayment": "decimal(18,2)",
    "leasemileageallowance": "decimal(18,2)",
    "leaseendvalue": "decimal(18,2)",
    "warrantyfee": "decimal(18,2)",
    "weowesaletotal": "decimal(18,2)",
    "crmsalesmgrname": "string",
    "crmsp1name": "string",
    "contractdate": "timestamp",
    "salesdate": "timestamp",
    "rowlastupdatedutc": "timestamp",
}

MERGE_KEYS = ("dealno", "custno", "vin", "rowlastupdatedutc")  # :364-383


def sql_over_frames(spark: SparkSession, query: str, **frames: DataFrame) -> DataFrame:
    """UD5: register frames as temp views, run SQL, return the result."""
    for name, df in frames.items():
        df.createOrReplaceTempView(name)
    return spark.sql(query)


def run_vehicle_sales_etl(
    spark: SparkSession,
    csv_path: str,
    lake_path: str,
    cast_map: Mapping[str, str] = VEHICLE_SALES_CAST,
    merge_keys: Sequence[str] = MERGE_KEYS,
) -> DataFrame:
    """CSV -> quality filter -> cast -> date-partitioned MERGE into the lake.

    Partitioning by sale year/month bounds each daily run's rewrite to the
    partitions the batch touches (write amplification control at 100 TB;
    mirrors the reference's daily S3 date layout, s3_upload_automation.py:200).
    Returns the typed frame that was merged.
    """
    raw = read_csv_typed(spark, csv_path, cast_map)
    typed = sql_over_frames(
        spark,
        """
        SELECT * FROM raw_sales
        WHERE vin IS NOT NULL AND custno IS NOT NULL AND salesdate IS NOT NULL
        """,
        raw_sales=raw.drop("_corrupt_record"),
    )
    partitioned = typed.withColumn("sale_year", F.year("salesdate")).withColumn(
        "sale_month", F.month("salesdate")
    )
    merge_upsert(
        spark,
        lake_path,
        partitioned,
        keys=list(merge_keys),
        order_by=["rowlastupdatedutc"],
        partition_cols=["sale_year", "sale_month"],
    )
    return typed
