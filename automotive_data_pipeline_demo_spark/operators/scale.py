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

from pyspark.sql import DataFrame, SparkSession, Window
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


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet range-partitioned AND sorted on ``sort_cols`` — the
    Spark-side equivalent of a Redshift compound SORTKEY
    (``sql/redshift_table_schemas.sql:314-325``).

    ``repartitionByRange`` gives each output file a disjoint key range and
    ``sortWithinPartitions`` orders rows inside it, so every parquet
    row-group's min/max statistics are tight on the sort column: a range
    predicate on it skips whole files and row groups at the scan instead of
    reading 100 TB to filter. Bucketing (``write_bucketed``) co-locates
    equi-JOIN keys; this co-locates RANGE-scan keys — the two layouts
    together cover the reference's DISTSTYLE + SORTKEY posture.
    """
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def hash_prefilter_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str | None = None,
    how: str = "left_semi",
    n_buckets: int = 1 << 20,
) -> DataFrame:
    """Semi/anti join a huge fact table against a large key set, pruning the
    fact scan with a broadcast hash-bucket filter before any shuffle.

    The key set is projected to DISTINCT ``xxhash64(key) % n_buckets``
    buckets — bounded by ``n_buckets`` rows (a few MB) no matter how many
    keys there are, so it broadcasts even when the key set itself is far too
    big to broadcast. Fact rows whose bucket is absent are resolved at the
    scan with zero shuffle; only bucket-hit rows (true matches plus the
    occupancy-rate false positives) continue to the exact semi/anti join.
    This is the runtime-filter / bloom-join pattern (one hash function)
    built from public DataFrame ops; results are exactly the plain
    semi/anti join's.

    Reference parity: the processed-leads ``NOT IN`` guard
    (``lead-processor/index.js:208-214``) — P8's anti join — whose shuffle
    at 100 TB would move the whole fact table; here the definite-miss rows
    (the vast majority for a selective key set) never leave the scan.

    ``how='left_semi'``: one pass — prune then exact semi join.
    ``how='left_anti'``: two branches over the fact scan — bucket-miss rows
    are definite non-matches emitted shuffle-free, bucket-hit rows go
    through the exact anti join; a second columnar scan is the price of
    keeping both branches shuffle-minimal, and at scale a pruned scan is
    far cheaper than a fact-table shuffle.
    """
    if how not in ("left_semi", "left_anti"):
        raise ValueError(
            f"hash_prefilter_join supports how='left_semi' or 'left_anti', got {how!r}"
        )
    keys_key = keys_key or fact_key
    if "__bucket" in fact.columns:
        raise ValueError("fact already has a __bucket column")
    fact_bucket = F.pmod(F.xxhash64(F.col(fact_key)), F.lit(n_buckets))
    buckets = keys.select(
        F.pmod(F.xxhash64(F.col(keys_key)), F.lit(n_buckets)).alias("__bucket")
    ).distinct()
    if how == "left_semi":
        pruned = fact.join(
            F.broadcast(buckets), fact_bucket == F.col("__bucket"), "left_semi"
        )
        return pruned.join(keys, pruned[fact_key] == keys[keys_key], "left_semi")
    miss = fact.join(
        F.broadcast(buckets), fact_bucket == F.col("__bucket"), "left_anti"
    )
    hit = fact.join(
        F.broadcast(buckets), fact_bucket == F.col("__bucket"), "left_semi"
    )
    exact_miss = hit.join(keys, hit[fact_key] == keys[keys_key], "left_anti")
    return miss.unionByName(exact_miss)


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


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 20,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top_k`` heaviest keys with their
    row counts and corpus share — the report that decides whether a key
    needs `salted_join`/`salted_groupby_sum` (one key holding >1% of a
    100 TB table serializes its whole partition through one task).

    One exchange: counts aggregate per key with map-side partials; the
    top-k cut is TakeOrderedAndProject (per-partition heaps, no global
    sort) and the total rides along from the same counts table via a
    single-row broadcast. share is one exact-int division rounded to 6 dp.
    Ties break by key text ascending so the report is deterministic.
    """
    keys = [F.col(c).cast("string").alias(c) for c in key_cols]
    counts = df.select(*keys).groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("long").alias("__total"))
    key_str = F.concat_ws("|", *[F.col(c) for c in key_cols])
    top = (
        counts.select(key_str.alias("key"), "n_rows")
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
    return top.crossJoin(F.broadcast(total)).select(
        "key",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
    )


def global_sequence(
    df: DataFrame,
    order_by: Sequence[str],
    out_col: str = "seq",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global 1-based row numbering WITHOUT a one-partition
    sort.

    The naive ``ROW_NUMBER() OVER (ORDER BY ...)`` plans as an exchange of
    the ENTIRE dataset into a single partition — the canonical 100 TB
    scale-killer (and exactly what the catalog's single-partition plan
    guard exists to catch). The distributed recipe:

    1. range-partition on ``order_by`` (each partition owns a disjoint,
       ordered key range);
    2. count rows per partition — at most ``num_partitions`` longs reach
       the driver, independent of data size;
    3. each partition locally sorts and numbers its own range, then adds
       its predecessors' cumulative count as an offset (a broadcastable
       literal map).

    ``order_by`` must be a total order (unique; the module-wide tiebreaker
    discipline) or numbering within ties is arbitrary. The range-tagged
    frame is persisted so the count pass and the output pass see the SAME
    sampled range boundaries — RangePartitioner samples its split points,
    so recomputation could re-draw them between the two actions.
    """
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    tagged = parts.withColumn("__pid", F.spark_partition_id()).persist()
    sizes = {r["__pid"]: r["n"] for r in
             tagged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(v) for pid in sorted(offsets) for v in (pid, offsets[pid])]
    )
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_by])
    return (
        tagged.withColumn(
            out_col,
            (F.row_number().over(w).cast("long") + off_map[F.col("__pid")]),
        )
        .drop("__pid")
    )
