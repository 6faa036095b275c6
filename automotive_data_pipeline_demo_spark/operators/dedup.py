"""Window-based dedup / ranking operators.

Reference parity:
- W1/W2 latest-record dedup: ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY
  updated DESC) = 1`` (``sql/customer_360_views.sql:71-74, 262-265``). The
  reference's signature operator — it appears four times.
- W3 purchase sequence: ``ROW_NUMBER() ... ORDER BY contractdate ASC``
  (``sql/customer_360_views.sql:350-353``).
- A4+W4 primary relationship: aggregate per (entity, group) then rank groups
  per entity by count/recency (``sql/customer_360_views.sql:528-542``).

Scale notes: each of these is ONE shuffle on the partition key. row_number
over a window needs a sort within each hash partition; Spark runs it as
Exchange(hashpartitioning(key)) + Sort + Window — no global sort. For 100 TB
fact tables the partition key (custno/dealno) is high-cardinality, so the
shuffle is well-spread; skewed mega-dealers are handled by AQE skew-join and,
for the agg path, by partial aggregation before the exchange. When several
downstream ops reuse the same key, repartition once and share the exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    cols = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        cols.append(col.desc() if descending else col.asc())
    return cols


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    tiebreakers: Sequence[Column | str] = (),
) -> DataFrame:
    """Keep the most recent row per key (W1/W2).

    ``order_by`` columns are taken descending (latest first). Pass unique
    ``tiebreakers`` for deterministic results when order values collide —
    the reference's ROW_NUMBER is nondeterministic on ties; we refuse to
    inherit that.
    """
    w = Window.partitionBy(*keys).orderBy(
        *_order_cols(order_by, descending=True),
        *_order_cols(tiebreakers, descending=False),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_latest_agg(
    df: DataFrame,
    keys: Sequence[str],
    rank: Column,
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Latest-record-per-key as ONE aggregate (scale variant of
    :func:`dedup_latest`).

    ``rank`` is a comparator column whose per-key MINIMUM identifies the
    surviving row. It MUST be a total order within each key (unique per
    row, never NULL): each output column is reassembled independently via
    ``min_by(col, rank)``, so a tied rank would stitch the survivor from
    different tied rows, and ``min_by`` skips NULL-ranked rows entirely.
    The window form's tiebreaker discipline (this module's docstring)
    already demands exactly that uniqueness.

    Physical contrast with the sort-window form (W1,
    ``sql/customer_360_views.sql:71-74``): ``row_number`` plans as
    Exchange(hash(key)) + Sort + Window over EVERY input row, while this
    form partial-aggregates map-side — each input partition shuffles at
    most one row per key it contains. With d duplicate rows per key per
    input partition the exchange moves ~1/d of the window form's bytes,
    which is the difference that matters on a 100 TB fact table.

    To get the pure HashAggregate plan (no sort anywhere), pack ``rank``
    into a single LONG (fixed-width bit fields, descending parts negated)
    and keep the needed ``payload`` columns primitive: Spark's
    HashAggregate requires fixed-width mutable aggregation buffers, so a
    struct- or string-typed rank (or value) silently falls back to
    SortAggregate — still one partial-combined exchange, but with a
    per-partition sort on both sides. Pass ``payload`` to limit the
    output to the columns actually needed downstream; the scan then
    prunes to exactly keys + payload + rank inputs.

    Prefer this form when only the surviving row is needed; keep the
    window form when the rank itself (sequence numbers, top-N > 1) is the
    output, or when the row is too wide to re-assemble column-wise.
    """
    cols = [c for c in (payload or df.columns) if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.min_by(c, rank).alias(c) for c in cols]
    )


def sequence_number(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str = "sequence_number",
    tiebreakers: Sequence[Column | str] = (),
) -> DataFrame:
    """Ascending per-key sequence (W3): 1 = first event for the key."""
    w = Window.partitionBy(*keys).orderBy(
        *_order_cols(order_by, descending=False),
        *_order_cols(tiebreakers, descending=False),
    )
    return df.withColumn(out_col, F.row_number().over(w))


def primary_relationship(
    df: DataFrame,
    entity_key: str,
    group_key: str,
    order_agg: dict[str, Column] | None = None,
    single_shuffle: bool = True,
) -> DataFrame:
    """Pick each entity's "primary" group: most rows, then most recent (A4+W4).

    Returns one row per entity with ``group_key``, ``transaction_count`` and
    any extra aggregates from ``order_agg`` (name -> agg Column).

    With ``single_shuffle`` (default) the input is pre-partitioned on
    ``entity_key`` alone: hashpartitioning(entity) satisfies both the
    two-key groupBy's clustering AND the window's partitioning, so the whole
    operator runs in ONE exchange of raw rows. Set it False when rows per
    (entity, group) are huge — then the classic plan (partial-aggregated
    groupBy shuffle + window re-shuffle of the tiny aggregate) moves fewer
    bytes despite the second exchange.
    """
    aggs = [F.count(F.lit(1)).alias("transaction_count")]
    extra_names: list[str] = []
    for name, col in (order_agg or {}).items():
        aggs.append(col.alias(name))
        extra_names.append(name)
    src = df.repartition(entity_key) if single_shuffle else df
    grouped = src.groupBy(entity_key, group_key).agg(*aggs)
    order = [F.col("transaction_count").desc()]
    order += [F.col(n).desc() for n in extra_names]
    order += [F.col(group_key).asc()]  # deterministic tiebreak
    w = Window.partitionBy(entity_key).orderBy(*order)
    return (
        grouped.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") == 1)
        .drop("__rank")
    )
