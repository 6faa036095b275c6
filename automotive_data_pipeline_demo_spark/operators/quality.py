"""Table-level data-quality expectations: one report DataFrame per table.

The reference validates inputs predicate-by-predicate inside each job
(glue_vehicle_sales_etl.py casts + the api-server's field checks,
identity-resolution/api-server.js:118-140); at warehouse scale the same
checks belong in one declarative pass that a pipeline can gate on —
null rates on required columns, primary-key uniqueness, value-range
bounds, and referential integrity against a dimension.

Scale shape: EVERY expectation — nulls, ranges, the PK count-distinct,
and referential integrity — folds into a SINGLE aggregate over one scan
of the fact table. The FK check rides as a broadcast left join with a
hit indicator summed alongside the other checks, so adding a dimension
check costs zero extra passes (project the dimension to its key columns
before calling so the broadcast stays small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    ranges: Sequence[tuple[str, Column]] = (),
    fk: tuple[Sequence[str], DataFrame, Sequence[str]] | None = None,
) -> DataFrame:
    """Expectation report: one row per check — (check_name, n_rows,
    n_violations, passed).

    - ``not_null``: columns that must never be NULL (check ``not_null:c``).
    - ``unique``: key columns whose combination must be unique
      (``unique:c1,c2`` — violations = rows beyond the first per key).
    - ``ranges``: (name, boolean Column) pairs; violations = rows where
      the predicate is NOT satisfied, NULLs counting as violations
      (``range:name``).
    - ``fk``: (cols, dim_df, dim_cols) — rows whose key has no match in
      the dimension (``fk:c1,c2``); rows with any NULL key column are not
      orphans (SQL FK semantics).
    """
    scanned = df
    names: list[str] = []
    aggs: list[Column] = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.sum(F.col(c).isNull().cast("long")))
    if unique:
        names.append("unique:" + ",".join(unique))
        aggs.append(
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in unique])
        )
    for name, pred in ranges:
        names.append(f"range:{name}")
        aggs.append(F.sum(F.when(pred, F.lit(0)).otherwise(F.lit(1)).cast("long")))
    if fk is not None:
        cols, dim, dim_cols = fk
        cols, dim_cols = list(cols), list(dim_cols)
        keys = (
            dim.select(*[F.col(d).alias(c) for c, d in zip(cols, dim_cols)])
            .distinct()
            .withColumn("__fk_hit", F.lit(1))
        )
        scanned = df.join(F.broadcast(keys), cols, "left")
        names.append("fk:" + ",".join(cols))
        key_present = F.lit(True)
        for c in cols:
            key_present = key_present & F.col(c).isNotNull()
        aggs.append(
            F.sum(
                F.when(key_present & F.col("__fk_hit").isNull(), F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            )
        )
    row = scanned.agg(
        F.count(F.lit(1)).alias("__n"),
        *[a.alias(f"__v{i}") for i, a in enumerate(aggs)],
    )
    return row.select(
        F.col("__n").alias("n_rows"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(names[i]).alias("check_name"),
                        F.col(f"__v{i}").cast("long").alias("n_violations"),
                    )
                    for i in range(len(names))
                ]
            )
        ).alias("__c"),
    ).select(
        "__c.check_name",
        "n_rows",
        "__c.n_violations",
        (F.col("__c.n_violations") == 0).cast("int").alias("passed"),
    )
