"""Model-based quality scoring: a feature-hashed linear text classifier.

Production pretraining pipelines gate documents with a cheap learned linear
model over hashed token features (fastText / DCLM-style quality
classifiers). The Spark-native shape of that scorer is a ZERO-SHUFFLE
narrow map: hash each token into one of ``n_buckets`` feature buckets,
look the bucket's weight up, sum, divide by token count — all inside
whole-stage codegen via higher-order functions, no explode, no join.

Weights are a per-model constant: at 100 TB they travel as a plan literal
(or a broadcast map for large vocabularies), never as a shuffled table.
Here the demo "model" derives its integer weights deterministically from
the bucket id (a Weyl-sequence hash), so both Spark and the DuckDB oracle
reproduce the exact same scores without shipping a weights file; swapping
in trained weights is a one-line change (pass ``weights=``).

The score arithmetic is exact-integer until one final IEEE division, per
the catalog determinism rules (plans/catalog.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automotive_data_pipeline_demo_spark.extensions.text_analysis import (
    bind_once,
    tokenize,
)

#: Demo model: weight(bucket) = (bucket * KNUTH) % MOD - SHIFT, an integer
#: in [-998, 998]. KNUTH is Knuth's multiplicative-hash constant.
KNUTH = 2654435761
MOD = 1997
SHIFT = 998


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Feature-hash a token into [0, n_buckets) via the first 8 md5 hex
    chars — the same engine-portable hash the LSH/sampling entries use."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long") % n_buckets


def _weight(bucket: Column) -> Column:
    return (bucket * F.lit(KNUTH)) % F.lit(MOD) - F.lit(SHIFT)


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
    threshold: float = -140.0,
    weights: dict[int, int] | None = None,
) -> DataFrame:
    """Score every document with the hashed linear model; zero shuffles.

    Returns (id, n_tok, raw_score, quality_logit, keep):
    ``raw_score`` is the exact integer sum of per-token bucket weights,
    ``quality_logit`` = round(raw_score / n_tok, 4), ``keep`` = 1 when the
    logit clears ``threshold``. Empty documents get NULL logit and keep=0.

    ``weights`` overrides the derived demo weights with a trained
    {bucket: weight} table, folded into the plan as a literal map (the
    broadcast-free path for models up to ~1e5 buckets; beyond that, join
    against a broadcast weights DataFrame instead).
    """
    if weights is not None:
        wmap = F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
        )

        def tok_weight(t: Column) -> Column:
            return F.coalesce(
                wmap[_bucket(t, n_buckets)], F.lit(0)
            ).cast("long")

    else:

        def tok_weight(t: Column) -> Column:
            return _weight(_bucket(t, n_buckets)).cast("long")

    def score(toks: Column) -> Column:
        return F.struct(
            F.size(toks).cast("long").alias("n_tok"),
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + tok_weight(t)
            ).alias("raw"),
        )

    scored = df.select(
        F.col(id_col).alias("id"),
        bind_once(tokenize(F.col(text_col)), score).alias("__s"),
    ).select(
        "id",
        F.col("__s.n_tok").alias("n_tok"),
        F.col("__s.raw").alias("raw_score"),
    )
    logit = F.when(
        F.col("n_tok") > 0,
        F.round(F.col("raw_score").cast("double") / F.col("n_tok"), 4),
    )
    return scored.select(
        "id",
        "n_tok",
        "raw_score",
        logit.alias("quality_logit"),
        F.when(logit >= F.lit(threshold), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("keep"),
    )
