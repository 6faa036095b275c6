"""Classification helpers: CASE ladders and ILIKE bucket classifiers.

Reference parity:
- F5 ILIKE classify: ``modeltype ILIKE '%new%'`` -> New/Used/CPO,
  ``saletype ILIKE '%cash%'`` -> Cash/Financed/Lease
  (``sql/customer_360_views.sql:290-304``).
- F7 multi-branch CASE ladders: generation buckets, recency buckets,
  segment ladder (``sql/customer_360_views.sql:119-167, 358-364, 473-510``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def ilike_classify(
    col: Column | str,
    rules: Sequence[tuple[str, str]],
    default: str | None = None,
) -> Column:
    """First case-insensitive '%pattern%' substring match wins.

    ``rules`` = [(substring, label), ...]; evaluation order matters, exactly
    like the reference's CASE WHEN x ILIKE ... chains.
    """
    c = F.lower((F.col(col) if isinstance(col, str) else col).cast("string"))
    expr: Column | None = None
    for substring, label in rules:
        cond = c.contains(substring.lower())
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "ilike_classify needs at least one rule"
    return expr.otherwise(F.lit(default))


def case_ladder(
    branches: Sequence[tuple[Column, Column | str]],
    default: Column | str | None = None,
) -> Column:
    """Ordered WHEN/THEN chain (F7)."""
    expr: Column | None = None
    for cond, value in branches:
        val = F.lit(value) if isinstance(value, str) else value
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    assert expr is not None, "case_ladder needs at least one branch"
    if default is not None:
        default = F.lit(default) if isinstance(default, str) else default
        expr = expr.otherwise(default)
    return expr


def recency_bucket(
    date_col: Column | str,
    as_of: Column,
    buckets: Sequence[tuple[int, str]],
    default: str = "Inactive",
    null_label: str | None = None,
) -> Column:
    """Days-since bucketing (F11/F12, sql/customer_360_views.sql:358-364).

    ``buckets`` = [(max_days_inclusive, label), ...] ascending. ``as_of``
    replaces CURRENT_DATE so results are deterministic (SURVEY hard spot #4).
    """
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    days = F.datediff(as_of, c)
    branches: list[tuple[Column, Column | str]] = []
    if null_label is not None:
        branches.append((c.isNull(), null_label))
    for max_days, label in buckets:
        branches.append((days <= max_days, label))
    return case_ladder(branches, default)
