"""Deterministic sampling, splitting, and sequence packing for training data.

Beyond-reference extension (BASELINE.json north star): the reference engine
(automotive-data-pipeline-demo) has no sampling surface; a training-data
pipeline at 100 TB needs one, and it must be *deterministic*. All assignment
here is content-addressed — an md5 over (salt, row id), never ``rand()`` — so
re-running the job yields the same split, appending new documents never
reassigns existing ones, and any engine (the DuckDB oracle included) can
re-derive every bucket bit-for-bit.

Scale notes:
- ``hash_split`` and ``stratified_sample`` are pure narrow projections /
  filters — zero shuffles; Catalyst fuses them into the scan stage and the
  filter prunes rows before anything else runs. Sampling 100 TB costs one
  read pass and no exchange.
- ``pack_sequences`` packs within (group, shard) windows: the shard key
  bounds every window partition, so the within-window sort is many small
  task-local sorts, never a single-task global sort. Scale ``n_shards`` with
  the corpus to keep partitions executor-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-bucket resolution: fractions are expressed in 1/10000ths.
BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt|id).

    First 8 hex digits -> uint32 -> mod BUCKETS. Both operands are
    non-negative, so ``%`` and ``pmod`` agree across engines.
    """
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/... ) by deterministic hash.

    ``weights`` maps split name -> fraction; fractions are cut at cumulative
    bucket thresholds (resolution 1/10000). Iteration order of ``weights``
    fixes the threshold order, so pass an ordered dict. Zero-shuffle: the
    whole operator is one projected expression.
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", last)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic stratified sample: keep ``fractions[stratum]`` of rows.

    Per-stratum keep thresholds over the same hash-bucket space as
    ``hash_split``; strata missing from ``fractions`` keep
    ``default_fraction``. Zero-shuffle — a single filter the optimizer
    pushes to the scan.
    """
    thresh: Column = F.lit(int(round(default_fraction * BUCKETS)))
    expr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        cut = int(round(frac * BUCKETS))
        expr = F.when(cond, cut) if expr is None else expr.when(cond, cut)
    if expr is not None:
        thresh = expr.otherwise(thresh)
    return df.filter(hash_bucket(id_col, salt) < thresh)


def uniform_sample_k(
    df: DataFrame, id_col: str, k: int, salt: str = "uk"
) -> DataFrame:
    """Exactly-k uniform sample without replacement, deterministically.

    Orders by md5(salt|id) and takes k — the hash order is a deterministic
    corpus shuffle, so this is simultaneously a fixed-size sample and a
    reproducible training-order permutation. Spark plans it as
    TakeOrderedAndProject: per-partition top-k heaps + a driver merge of k
    rows per partition — no global sort is ever materialized, so it scales
    to any corpus size for reasonable k.
    """
    key = F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    return df.orderBy(key.asc()).limit(k)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_count: Column,
    budget: int,
    n_shards: int = 16,
) -> DataFrame:
    """Assign documents to fixed-token-budget sequences (context windows).

    Contiguous offset packing: within each (group, shard), documents are laid
    end-to-end in id order and a document belongs to the sequence bin where
    its span *starts* — ``floor((cumsum(tokens) - tokens) / budget)``. This
    is the streaming-concat packing LLM pipelines use (documents straddling a
    boundary are split at tokenization time; the bin id says which window the
    document starts in). Exactly one shuffle: the hash exchange feeding the
    (group, shard) window; shard = id % n_shards bounds every partition so no
    single task ever sorts the whole group.

    Returns (id, group, shard, n_tokens, seq_bin).
    """
    w = Window.partitionBy(group_col, "shard").orderBy("id")
    return (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(group_col).alias(group_col),
            F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int").alias("shard"),
            token_count.cast("long").alias("n_tokens"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            "id",
            group_col,
            "shard",
            "n_tokens",
            F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
            .cast("long")
            .alias("seq_bin"),
        )
    )


def mixture_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights_ppm: dict[str, int],
    salt: str = "mix",
) -> DataFrame:
    """Deterministic mixture-weighted downsample to target group proportions
    — the "data mixing" step of LLM corpus curation (rebalance languages /
    domains / sources to a prescribed recipe).

    ``weights_ppm`` maps group -> target share in parts-per-million (exact
    ints summing to 1_000_000). The output is the largest hash-deterministic
    subset whose expected proportions match the recipe: with group sizes
    n_g, the achievable budget is N = min_g floor(n_g·1e6/w_g) (the
    scarcest group binds), and each group keeps rows whose
    ``hash_bucket(id) < floor(N·w_g·BUCKETS / (1e6·n_g))``. Groups not in
    the recipe are dropped.

    Scale shape: ONE tiny group-count aggregate collected to the driver
    (groups are languages/domains — dozens), thresholds computed exactly in
    arbitrary-precision ints, then a single literal CASE filter the
    optimizer pushes into the scan — the corpus itself never shuffles.
    Content-addressed hashing keeps the selection stable under re-runs and
    appends, and any engine re-derives the same rows bit-for-bit.
    """
    if any(w <= 0 for w in weights_ppm.values()):
        raise ValueError("mixture weights must be positive ppm ints")
    if sum(weights_ppm.values()) != 1_000_000:
        raise ValueError(
            f"mixture weights must sum to 1_000_000 ppm, got {sum(weights_ppm.values())}"
        )
    counts = {
        r["g"]: int(r["n"])
        for r in df.groupBy(F.col(group_col).alias("g")).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        if r["g"] in weights_ppm
    }
    present = {g: w for g, w in weights_ppm.items() if counts.get(g, 0) > 0}
    if not present:
        return df.filter(F.lit(False))
    budget = min(counts[g] * 1_000_000 // w for g, w in present.items())
    cuts = {
        g: budget * w * BUCKETS // (1_000_000 * counts[g])
        for g, w in present.items()
    }
    thresh: Column | None = None
    for g in sorted(cuts):
        cond = F.col(group_col) == g
        thresh = (
            F.when(cond, cuts[g]) if thresh is None else thresh.when(cond, cuts[g])
        )
    return df.filter(hash_bucket(id_col, salt) < thresh.otherwise(F.lit(0)))


def temperature_weights_ppm(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> dict[str, int]:
    """Temperature-scaled mixture recipe from observed group sizes: target
    share p_g ∝ n_g^alpha (the mT5 / XLM-R sampling rule — alpha < 1
    upweights rare languages/domains; alpha = 1 is proportional).

    Returns a ppm dict summing to exactly 1_000_000, built with integer
    largest-remainder allocation so any engine re-derives it bit-for-bit:
    s_g = floor(n_g^alpha * 1e6) (for the default alpha = 0.5 this is
    floor(sqrt(n)*1e6) — sqrt and multiply are correctly-rounded IEEE ops,
    identical across engines; arbitrary alpha goes through pow, whose last
    bit is not portable — keep oracle-pinned recipes on 0.5), base share =
    s_g*1e6 // S, and the leftover ppm go one each to the largest
    remainders (ties broken by group name).

    One tiny group-count aggregate (groups are languages/domains — dozens);
    feed the result to ``mixture_resample``, which turns it into a single
    pushed-down CASE filter.
    """
    import math

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = {
        r["g"]: int(r["n"])
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r["g"] is not None
    }
    if not counts:
        return {}
    scaled = {
        g: int(math.floor((math.sqrt(n) if alpha == 0.5 else n**alpha) * 1_000_000))
        for g, n in counts.items()
    }
    total = sum(scaled.values())
    base = {g: s * 1_000_000 // total for g, s in scaled.items()}
    leftover = 1_000_000 - sum(base.values())
    order = sorted(scaled, key=lambda g: (-(scaled[g] * 1_000_000 % total), g))
    for g in order[:leftover]:
        base[g] += 1
    if any(w == 0 for w in base.values()):
        raise ValueError(
            "temperature recipe assigned 0 ppm to a group (micro-group in a "
            "huge-group mixture); drop micro-groups before resampling"
        )
    return base


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-sampled corpus rebalance: ``mixture_resample`` with the
    ``temperature_weights_ppm`` recipe (p_g ∝ n_g^alpha) derived from the
    corpus itself. Same scale shape as mixture_resample: two tiny
    group-count aggregates, then one pushed-down hash-threshold filter —
    the corpus never shuffles.
    """
    weights = temperature_weights_ppm(df, group_col, alpha)
    if not weights:
        return df.filter(F.lit(False))
    return mixture_resample(df, id_col, group_col, weights, salt)


def shard_manifest(packed: DataFrame, group_col: str) -> DataFrame:
    """Delivery manifest for packed training shards: one row per
    (group, shard, seq_bin) with document count, token total, and a
    content-addressed digest (md5 over the sorted member ids).

    The digest lets a consumer verify a shard holds exactly the intended
    documents without reading payloads, and makes the whole export
    re-run-verifiable: deterministic packing in -> bit-identical manifest
    out. One exchange — the groupBy on the shard key (which
    ``pack_sequences`` output is already partitioned by, so Catalyst
    reuses the window's exchange when composed directly).
    """
    ids_sorted = F.array_sort(F.collect_list(F.col("id")))
    return packed.groupBy(group_col, "shard", "seq_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.md5(
            F.concat_ws(",", F.transform(ids_sorted, lambda x: x.cast("string")))
        ).alias("id_digest"),
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    fraction: float,
) -> DataFrame:
    """Per-domain quality selection (the DCLM/FineWeb curation rule: keep
    the best ``fraction`` of documents WITHIN each source, so one
    high-volume low-quality domain cannot crowd out the mixture).

    Implemented as an exact per-group percentile THRESHOLD JOIN, not a
    per-group window rank: the thresholds table is one row per domain, so
    it broadcasts, and the corpus side is filtered in the scan stage
    without ever shuffling — a partition-by-domain window would instead
    shuffle the full corpus and serialize each hot domain through one
    task. Ties at the threshold are kept (>=), so the result is
    deterministic without an id tiebreak. The only shuffle is the
    threshold aggregation itself, which carries (group, score) pairs; at
    100 TB swap ``percentile`` for ``approx_percentile`` to make that agg
    single-pass mergeable with bounded memory.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    thresholds = df.groupBy(group_col).agg(
        F.percentile(F.col(score_col), F.lit(1.0 - fraction)).alias("__thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.col(score_col) >= F.col("__thr"))
        .drop("__thr")
    )


def interleave_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    n_shards: int = 8,
    salt: str = "interleave",
) -> DataFrame:
    """Deterministic sharded training order that INTERLEAVES sources.

    Writing a curated corpus out in table order feeds the trainer long
    same-source runs (all of source A, then all of B), which biases early
    training. This emits a (shard, pos) order where consecutive positions
    cycle through sources: rows are ranked within (shard, source) by a
    salted hash, and position orders by (rank, source) — position p in a
    shard holds round ceil(p/k) of the per-source streams.

    Scale shape: one window per (shard, source) partition and one per
    shard — no global single-partition sort; shards are independent units
    a trainer consumes in parallel (the shard_manifest pattern covers
    delivery verification). Deterministic for fixed inputs and salt.
    """
    shard = F.pmod(hash_bucket(F.col(id_col), salt), F.lit(n_shards))
    rank_w = Window.partitionBy("__shard", source_col).orderBy(
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    pos_w = Window.partitionBy("__shard").orderBy(
        F.col("__rank"), F.col(source_col), F.col(id_col)
    )
    return (
        df.withColumn("__shard", shard)
        .withColumn("__rank", F.row_number().over(rank_w))
        .withColumn("pos", F.row_number().over(pos_w))
        .select(
            F.col("__shard").alias("shard"),
            "pos",
            F.col(id_col),
            F.col(source_col),
        )
    )
