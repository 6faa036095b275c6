"""Array aggregation helpers.

Reference parity: A3 ordered distinct array agg —
``ARRAY_AGG(DISTINCT vh.make ORDER BY vh.purchase_date DESC)``
(``sql/customer_360_views.sql:407-408``). Spark has no ordered-distinct
aggregate (collect_set is unordered), so we compose built-ins:

    collect (order_key, value) structs -> sort desc by order_key ->
    project value -> stable de-dup keeping first occurrence.

All steps are JVM-side higher-order functions (no UDF); the only shuffle is
the groupBy's own.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_distinct_array(value: Column | str, order_by: Column | str, ascending: bool = False) -> Column:
    """Aggregate expression: DISTINCT ``value``s ordered by ``order_by``.

    Ties on ``order_by`` are broken by ``value`` itself so the result is
    deterministic (the reference's ARRAY_AGG is not on ties).
    First occurrence wins after sorting, matching Postgres/Redshift
    DISTINCT-ON-first semantics.
    """
    v = F.col(value) if isinstance(value, str) else value
    o = F.col(order_by) if isinstance(order_by, str) else order_by
    # NULL values are skipped (collect_list drops the NULL produced by the
    # unmatched when-branch), matching ARRAY_AGG/string_agg null handling
    pairs = F.collect_list(F.when(v.isNotNull(), F.struct(o.alias("o"), v.alias("v"))))
    sorted_pairs = F.array_sort(
        pairs,
        lambda a, b: F.when(a["o"] < b["o"], 1 if not ascending else -1)
        .when(a["o"] > b["o"], -1 if not ascending else 1)
        .when(a["v"] < b["v"], -1)
        .when(a["v"] > b["v"], 1)
        .otherwise(0),
    )
    values = F.transform(sorted_pairs, lambda s: s["v"])
    # stable distinct: keep first occurrence (array_distinct preserves order)
    return F.array_distinct(values)
