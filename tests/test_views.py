"""End-to-end view-DAG test (SURVEY §5 plan item 2): the six customer-360
views over dirty domain fixtures, DuckDB running the ported reference SQL
as oracle.
"""

from __future__ import annotations

import duckdb
import pytest

from automotive_data_pipeline_demo_spark.plans.views import build_view_dag
from tests import fixtures
from tests.oracle_harness import compare
from tests.reference_views_sql import ALL_VIEW_SQL

VIEWS = [
    "customer_profiles",
    "customer_vehicle_history",
    "customer_segments",
    "dealership_customer_profiles",
    "validated_vehicle_sales",
    "data_privacy_status",
]


@pytest.fixture(scope="module")
def domain_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("domain")
    return fixtures.write_fixtures(str(d))


@pytest.fixture(scope="module")
def spark_views(spark, domain_paths):
    cm = spark.read.parquet(domain_paths["customer_master"])
    vs = spark.read.parquet(domain_paths["vehicle_sales"])
    return build_view_dag(cm, vs, fixtures.AS_OF)


@pytest.fixture(scope="module")
def oracle_con(domain_paths):
    con = duckdb.connect()
    for name, path in domain_paths.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    for sql_fn in ALL_VIEW_SQL:
        con.execute(sql_fn(fixtures.AS_OF))
    yield con
    con.close()


@pytest.mark.parametrize("view", VIEWS)
def test_view_matches_reference_oracle(view, spark_views, oracle_con):
    spark_pdf = spark_views[view].toPandas()
    oracle_pdf = oracle_con.execute(f"SELECT * FROM {view}_o").fetchdf()
    assert len(spark_pdf) > 0, f"{view}: fixture produced no rows"
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{view}: " + "; ".join(problems)
