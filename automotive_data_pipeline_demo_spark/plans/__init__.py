"""Query plans: the operator catalog, the customer-360 view DAG, and the
incremental gold-table refresh."""

from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG, QuerySpec
from automotive_data_pipeline_demo_spark.plans.refresh import (
    close_over_deals,
    detect_changed_keys,
    full_build_gold,
    read_gold,
    refresh_gold,
)

__all__ = [
    "CATALOG",
    "QuerySpec",
    "close_over_deals",
    "detect_changed_keys",
    "full_build_gold",
    "read_gold",
    "refresh_gold",
]
