"""t2 rehearsal: every catalog query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG
from tests.oracle_harness import compare, duckdb_conn

ORACLED = [s for s in CATALOG if s.oracle is not None]
ROWS_ONLY = [s for s in CATALOG if s.oracle is None]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", ORACLED, ids=[s.name for s in ORACLED])
def test_oracle_match(spec, spark, sf_dir, con):
    df = spec.build(spark, sf_dir)
    # the external driver's canonicalizer (pandas sort_values over every
    # column) dies on unhashable cells — array/map/struct outputs must be
    # rendered to strings per the catalog determinism rule (x_text_postings
    # was driver-red for a round on exactly this while passing locally)
    for f in df.schema.fields:
        assert f.dataType.typeName() not in ("array", "map", "struct"), (
            f"{spec.name}: column {f.name} is {f.dataType.simpleString()} — "
            "render it to a string/digest for the driver"
        )
    spark_pdf = df.toPandas()
    oracle_pdf = con.execute(spec.oracle).fetchdf()
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{spec.name}: " + "; ".join(problems)


@pytest.mark.parametrize("spec", ROWS_ONLY, ids=[s.name for s in ROWS_ONLY])
def test_rows_only_runs(spec, spark, sf_dir):
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
