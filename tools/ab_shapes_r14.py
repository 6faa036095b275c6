#!/usr/bin/env python
"""In-process interleaved shape A/B for the r14 semdedup / line-dedup
shared-subtree changes (the banked r13 protocol: competing plan shapes
over identical data, alternated round-robin in ONE session,
clearCache between runs, min-of-N — box spikes hit all shapes alike,
so the shape delta isolates).

Experiments (old = the r13/c8f0cd7 entry body, reconstructed inline
from the same public library functions; new = the catalog builder at
HEAD; lazy = new with the marked-persist left lazy):

  semdedup_inc   : x_dedup_semdedup_inc — keep_cols passthrough (no
                   join-back), persist+fill of the star window frame,
                   batch-only kept assignment, broadcast losers
  semdedup       : x_dedup_semdedup — keep_cols passthrough (no
                   join-back), persist+fill vs the old ReusedExchange
  line_dedup_inc : x_text_line_dedup_inc — persist+fill of the framed
                   batch

Usage:
    python tools/ab_shapes_r14.py [--rounds 3] [--sf DIR] exp...
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("exps", nargs="*")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import automotive_data_pipeline_demo_spark.extensions.similarity as sim
    from automotive_data_pipeline_demo_spark.extensions.dedup_text import (
        dedup_corpus, line_dedup, line_digest,
    )
    from automotive_data_pipeline_demo_spark.extensions.similarity import (
        assign_to_stored_centroids, embedding_near_dup_pairs,
        kmeans_centroids, kmeans_lloyd,
    )
    from automotive_data_pipeline_demo_spark.functions.caching import (
        eager_fill, release_caches,
    )
    from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG, _t
    from automotive_data_pipeline_demo_spark.plans.catalog_sources import (
        _scratch,
    )
    from automotive_data_pipeline_demo_spark.session import get_spark

    by_name = {s.name: s for s in CATALOG}

    # ---- old entry bodies (pre-r14-optimization, c8f0cd7) -------------

    def semdedup_inc_old(spark, sf):
        emb = _t(spark, sf, "embeddings")
        n = emb.count()
        cutoff = n * 8 // 10
        corpus = emb.filter(F.col("vec_id") < cutoff)
        k = max(8, math.ceil(cutoff / 128))
        seeds = corpus.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_vec"),
        )
        cent_path = _scratch(sf, "semdedup_centroids")
        kmeans_centroids(
            corpus, seeds, n_iter=1, route_probe=2
        ).write.mode("overwrite").parquet(cent_path)
        cents = spark.read.parquet(cent_path)
        assign_all = assign_to_stored_centroids(emb, cents, route_probe=2)
        assigned = emb.join(assign_all, "vec_id").withColumn(
            "is_new", F.col("vec_id") >= cutoff
        )
        pairs = embedding_near_dup_pairs(
            assigned, threshold=0.30, block_col="centroid_id",
            new_col="is_new", collapse="star", max_cell_size=None,
        )
        losers = pairs.select(F.col("b_id").alias("vec_id")).distinct()
        kept = assign_all.filter(F.col("vec_id") >= cutoff).join(
            losers, "vec_id", "left_anti"
        )
        return kept.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("centroid_id").cast("int").alias("centroid_id"),
        )

    def semdedup_old(spark, sf):
        emb = _t(spark, sf, "embeddings")
        k = max(8, math.ceil(emb.count() / 128))
        seeds = emb.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_vec"),
        )
        assign = kmeans_lloyd(emb, seeds, n_iter=1, route_probe=2)
        cells = emb.join(assign, "vec_id")
        pairs = embedding_near_dup_pairs(
            cells, threshold=0.30, block_col="centroid_id",
            collapse="star", max_cell_size=None,
        )
        kept = dedup_corpus(emb, pairs, "vec_id")
        return kept.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("label").cast("int").alias("label"),
        )

    def line_dedup_inc_old(spark, sf):
        docs = _t(spark, sf, "documents")
        words = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
        w = words
        framed = F.array_join(
            F.transform(
                F.sequence(
                    F.lit(0), F.ceil(F.size(w) / F.lit(8)).cast("int") - 1
                ),
                lambda i: F.array_join(F.slice(w, i * F.lit(8) + 1, 8), " "),
            ),
            "\n",
        )
        base = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            framed.alias("ftext"),
        )
        corpus = base.filter(F.col("doc_id") < 400)
        batch = base.filter(F.col("doc_id") >= 400)

        def digest_counts(df):
            return (
                df.select(
                    "doc_id",
                    F.explode(F.split(F.col("ftext"), "\n")).alias("line"),
                )
                .filter(F.col("line") != "")
                .select("doc_id", line_digest("line").alias("line_h"))
                .distinct()
                .groupBy("line_h")
                .agg(F.count(F.lit(1)).alias("n_docs"))
            )

        hot = (
            digest_counts(corpus)
            .unionByName(digest_counts(batch))
            .groupBy("line_h")
            .agg(F.sum("n_docs").alias("df"))
            .filter(F.col("df") >= 2)
            .select("line_h")
        )
        return line_dedup(batch, "doc_id", "ftext", delim="\n",
                          hot_digests=hot)

    def _catalog(name, share):
        def run(spark, sf):
            sim._SHARE_MARKED = share
            return by_name[name].build(spark, sf)
        return run

    def _old(fn, share="off"):
        def run(spark, sf):
            sim._SHARE_MARKED = share
            return fn(spark, sf)
        return run

    EXPS = {
        "semdedup_inc": {
            "old": _old(semdedup_inc_old),
            "nop": _catalog("x_dedup_semdedup_inc", "off"),
            "new": _catalog("x_dedup_semdedup_inc", "fill"),
            "lazy": _catalog("x_dedup_semdedup_inc", "lazy"),
        },
        "semdedup": {
            "old": _old(semdedup_old),
            "nop": _catalog("x_dedup_semdedup", "off"),
            "new": _catalog("x_dedup_semdedup", "fill"),
            "lazy": _catalog("x_dedup_semdedup", "lazy"),
        },
        "line_dedup_inc": {
            "old": _old(line_dedup_inc_old),
            "new": _catalog("x_text_line_dedup_inc", "fill"),
        },
    }

    names = args.exps or list(EXPS)
    spark = get_spark(app_name="ab_shapes_r14")
    share0 = sim._SHARE_MARKED

    best: dict[tuple[str, str], float] = {}
    for rnd in range(args.rounds):
        for exp in names:
            for shape, fn in EXPS[exp].items():
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(
                    f"ab {exp}:{shape} r{rnd}")
                t0 = time.perf_counter()
                out = fn(spark, args.sf)
                out.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                release_caches(out)
                key = (exp, shape)
                best[key] = min(best.get(key, 9e9), dt)
                print(f"  r{rnd} {exp:16s} {shape:5s} {dt:7.2f}s",
                      flush=True)
    sim._SHARE_MARKED = share0

    print("\n== min-of-%d ==" % args.rounds)
    for exp in names:
        row = "  ".join(
            f"{shape}={best[(exp, shape)]:7.2f}s"
            for shape in EXPS[exp]
        )
        print(f"{exp:16s} {row}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
