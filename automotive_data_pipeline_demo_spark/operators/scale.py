"""Scale-posture operators: bucketed co-located joins and skew salting.

Reference parity: the reference leans on Redshift's physical layout —
``DISTSTYLE AUTO`` distribution and compound sortkeys
(``sql/redshift_table_schemas.sql:114-115, 220-221, 310-325``) — to keep its
fact/dim joins local. Spark's equivalents are bucketing (stable
co-partitioning across tables, so repeated equi-joins on the bucket key run
with ZERO exchanges) and, for the skewed-key problem the reference never had
to solve at its scale (a few mega-dealers dominate ``custno``/``branch``),
key salting that splits hot keys across ``n_salts`` partitions.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on in
the session factory) handles sort-merge skew at runtime; explicit salting is
for the cases AQE can't fix — skewed *aggregations* and broadcast-ineligible
hot-key joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Two tables bucketed the same way join on the bucket columns with no
    exchange on either side — the shuffle is paid once at write time and
    amortized over every subsequent join/aggregation on that key. At 100 TB
    this is the difference between re-shuffling the fact table per query and
    never shuffling it at all.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # external table: data at an explicit location instead of the
        # session warehouse dir (which is cwd-relative by default)
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (exchange-free).

    ``force_sort_merge`` pins the sort-merge strategy via a join hint: at
    toy scale the optimizer would rather broadcast the smaller table (a
    BroadcastExchange), which hides the zero-exchange co-location this
    operator exists to demonstrate; at 100 TB neither side is
    broadcastable and sort-merge over co-bucketed scans is the plan anyway.
    """
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), list(on), how)


def salted_groupby_sum(
    df: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (key, salt) — hot keys fan out over ``n_salts``
    reducers instead of melting one — stage 2 re-aggregates the (tiny)
    per-salt partials by key. The salt is derived from a hash of all sum
    columns, not a random number, so results are deterministic and
    re-runnable. Sums are algebraic, so partial+final composes exactly.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in sum_cols]), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*key_cols, *sum_cols, salt)
        .groupBy(*key_cols, "__salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-keyed big side against a small side, salt-split.

    The big side gets a deterministic salt in [0, n_salts); the small side
    is replicated n_salts times (explode of a literal range — n_salts × its
    row count, fine for dimension-sized tables). The join key becomes
    (key, salt), so a hot key's rows spread over n_salts partitions.

    Prefer ``broadcast(small)`` when the small side fits the broadcast
    threshold — salting is for the band where the small side is too big to
    broadcast but the big side's keys are too hot for sort-merge.

    ``how`` is ``'inner'`` or ``'left'`` only: the small side is replicated
    once per salt, so right/full semantics would keep each unmatched
    small-side row ``n_salts`` times.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner' or 'left', got {how!r} "
            "(the small side is replicated per salt; right/full would emit "
            "unmatched small-side rows once per salt)"
        )
    salted_big = skewed.withColumn(
        "__salt",
        F.pmod(
            F.hash(*[F.col(c) for c in skewed.columns if c != on]), F.lit(n_salts)
        ),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
