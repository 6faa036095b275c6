"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship customer-segmentation pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator catalog
(automotive_data_pipeline_demo_spark/plans/catalog.py) — one entry per
SURVEY.md §2 operator plus the training-data extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from automotive_data_pipeline_demo_spark.plans import catalog as _catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.q_flagship_segments(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return _catalog.oracle_sql()
