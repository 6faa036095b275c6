"""As-of (point-in-time) join — the classic operator Spark lacks natively.

Reference parity: J5's fallback contact match is an equi+time-proximity
hybrid (identity-resolution/api-server.js:254-260); the general form — for
every left row, the single latest right row with right_ts <= left_ts on the
same key — is also the backbone of price/point-in-time lookups in any
warehouse workload.

Implementation is the scalable union trick, NOT a range join: tag both
sides, union them, and run ONE window over (key, ts) taking the last
non-null right payload at or before each left row. One shuffle on the key,
O(n log n) per partition for the sort, zero pair blowup — a naive
range-join (left x right WHERE r.ts <= l.ts) is quadratic per key and a
QUALIFY/dedup afterwards; this never materializes the pairs at all.

Ties on right_ts are broken by ``tiebreak`` (ascending; the LAST — i.e.
greatest — tied row wins) so results are deterministic and oracle-hashable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_ts <= left_ts`` sharing the ``on`` keys (NULLs when none).

    ``right_cols`` are emitted with a ``matched_`` prefix (plus
    ``matched_<right_ts>``). ``tiebreak`` orders tied right timestamps
    (greatest wins); omit only when (on, right_ts) is unique.

    ``tolerance`` (an SQL interval string, e.g. ``"90 days"``) bounds
    match staleness, pandas ``merge_asof``-style: a right row older than
    ``left_ts - tolerance`` is treated as no match (all ``matched_*``
    NULL). Applied as a row-local predicate on the already-found match —
    the union+window plan is unchanged, so the bound costs nothing.
    """
    on = list(on)
    keep_right = [right_ts, *[c for c in right_cols if c != right_ts]]
    payload = F.struct(*[F.col(c).alias(c) for c in keep_right])

    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in keep_right) + ">"
        ).alias("__payload"),
    )
    rt_tb = (
        F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    )
    rt = right.select(
        *[
            (F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        rt_tb.alias("__tb"),
        payload.alias("__payload"),
    )
    unioned = lt.unionByName(rt)

    # right rows (is_left=0) sort before left rows at equal ts => <= is
    # inclusive; among tied right rows the greatest tiebreak sorts last and
    # wins the last() below
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        fresh = F.col(f"__match.{right_ts}").cast("timestamp") >= (
            F.col("__ts").cast("timestamp") - F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.withColumn(
            "__match", F.when(fresh, F.col("__match"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"matched_{c}") for c in keep_right
    ]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    how: str = "inner",
) -> DataFrame:
    """Interval join: pairs where ``right_ts`` falls in
    ``[left_ts + lower_s, left_ts + upper_s]`` (seconds) on the equality keys.

    A naive theta-join on the range predicate is a per-key cross product.
    Here both sides are BINNED by the window width: a right row lands in one
    bin; a left row's window spans at most two bins, so the left side
    explodes into <= 2 (key, bin) rows and the join is a plain equi-join on
    (key, bin) with the exact predicate re-checked after. Shuffle fan-out is
    bounded at 2x the left side regardless of data — the standard
    interval-join strategy (cf. Flink's interval join / bucketed range
    partitioning).

    ``how`` is ``'inner'`` or ``'left'``. Because the left side is exploded
    into up to two bin copies, a naive outer join over the exploded frame
    would emit one null-extended row PER COPY; ``'left'`` therefore runs the
    inner join and anti-joins the un-exploded left for the null-extended
    remainder (each zero-match left row appears exactly once). ``'right'`` /
    ``'full'`` are rejected — flip the sides for right semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"range_join supports how='inner' or 'left', got {how!r} "
            "(the exploded left side would duplicate null-extended rows "
            "under right/full semantics)"
        )
    width = max(upper_s - lower_s, 1)
    on = list(on)
    us = 1_000_000

    if how == "left":
        # row identity for the anti-join; partition-deterministic, no shuffle
        left = left.withColumn("__lid", F.monotonically_increasing_id())

    l_us = F.unix_micros(F.col(left_ts))
    lo_bin = F.floor((l_us + lower_s * us) / (width * us))
    hi_bin = F.floor((l_us + upper_s * us) / (width * us))
    lt = left.withColumn(
        "__lbin", F.explode(F.array_distinct(F.array(lo_bin, hi_bin)))
    ).withColumn("__l_us", l_us)
    # right side fully prefixed so self-joins have no ambiguous names
    rt = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    ).withColumn(
        "__rbin", F.floor(F.unix_micros(F.col(f"r_{right_ts}")) / (width * us))
    ).withColumn("__r_us", F.unix_micros(F.col(f"r_{right_ts}")))

    cond = F.col("__lbin") == F.col("__rbin")
    for k in on:
        cond = cond & (F.col(k) == F.col(f"r_{k}"))
    exact = (F.col("__r_us") >= F.col("__l_us") + lower_s * us) & (
        F.col("__r_us") <= F.col("__l_us") + upper_s * us
    )
    joined = lt.join(rt, cond & exact, "inner")
    matched = joined.drop(
        "__lbin", "__rbin", "__l_us", "__r_us", *[f"r_{k}" for k in on]
    )
    if how == "inner":
        return matched

    payload_cols = [c for c in right.columns if c not in on]
    unmatched = left.join(joined.select("__lid"), "__lid", "left_anti").select(
        "*",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"r_{c}")
            for c in payload_cols
        ],
    )
    return matched.unionByName(unmatched).drop("__lid")


def pit_join(
    left: DataFrame,
    scd2: DataFrame,
    on: Sequence[str],
    left_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    right_cols: Sequence[str] = (),
) -> DataFrame:
    """Point-in-time join against a type-2 dimension: for each left row,
    the version whose [valid_from, valid_to) interval covers ``left_ts``
    (training-set correctness: features as they WERE, no leakage from
    later versions).

    Because SCD2 intervals partition each key's timeline (valid_to =
    next valid_from; NULL = open), the covering version is exactly the
    latest valid_from <= left_ts — so this is ``asof_join`` on
    valid_from, one union + one window, never an interval range join
    with its pair fan-out. A guard column ``pit_valid`` re-checks
    ``left_ts < valid_to`` (1 for the open interval), so a malformed
    dimension (gaps/overlaps) surfaces as 0 instead of silently leaking.
    """
    out = asof_join(
        left,
        scd2,
        on=on,
        left_ts=left_ts,
        right_ts=valid_from,
        right_cols=[valid_to, *right_cols],
    )
    matched_to = F.col(f"matched_{valid_to}")
    return out.withColumn(
        "pit_valid",
        F.when(F.col(f"matched_{valid_from}").isNull(), F.lit(None).cast("int"))
        .when(matched_to.isNull() | (F.col(left_ts) < matched_to), 1)
        .otherwise(0),
    )
