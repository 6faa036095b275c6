"""Query plans: the operator catalog and the customer-360 view DAG."""

from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
