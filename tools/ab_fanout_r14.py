#!/usr/bin/env python
"""In-process interleaved shape A/B for the r14 fan_out change.

Three shapes of the parallelism floor, alternated round-robin in ONE
session (box spikes hit all shapes alike — the banked r13 protocol):

  none : fan_out is the identity (the r13 shape)
  rr   : round-robin repartition up to defaultParallelism (r14 HEAD)
  hash : hash repartition on the frame's FIRST column (no
         sort-before-repartition; first column is the id at every
         fan_out call site)

Usage:
    python tools/ab_fanout_r14.py [--rounds 3] [--sf DIR] entry...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1"))
    args = ap.parse_args()

    import automotive_data_pipeline_demo_spark.extensions.dedup_text as dd
    import automotive_data_pipeline_demo_spark.extensions.similarity as sim
    import automotive_data_pipeline_demo_spark.extensions.text_analysis as ta
    import automotive_data_pipeline_demo_spark.functions.parallelism as par
    import automotive_data_pipeline_demo_spark.plans.catalog_recent_extensions as cre
    from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG
    from automotive_data_pipeline_demo_spark.session import get_spark

    MODS = (dd, sim, ta, cre)

    def _ident(df, key=None, target=None):
        return df

    def _hash(df, key=None, target=None):
        spark = df.sparkSession
        t = target or spark.sparkContext.defaultParallelism
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:
            return df
        if cur >= t:
            return df
        return df.repartition(t, df[df.columns[0]])

    shapes = {"none": _ident, "rr": par.fan_out, "hash": _hash}

    by_name = {s.name: s for s in CATALOG}
    names = args.entries or [
        "x_dedup_simhash_dedup", "x_text_tfidf", "x_text_vocab",
        "x_text_bm25", "x_dedup_pipeline", "x_sim_bruteforce",
    ]
    spark = get_spark(app_name="ab_fanout_r14")

    best: dict[tuple[str, str], float] = {}
    for rnd in range(args.rounds):
        for shape, fn in shapes.items():
            for m in MODS:
                m.fan_out = fn
            for name in names:
                spec = by_name[name]
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                spec.build(spark, args.sf).write.format("noop").mode(
                    "overwrite").save()
                dt = time.perf_counter() - t0
                key = (name, shape)
                best[key] = min(best.get(key, float("inf")), dt)
                print(f"round{rnd} {shape:5s} {name:28s} {dt:7.2f}s",
                      flush=True)

    print("\n==== min across rounds ====")
    for name in names:
        row = "  ".join(
            f"{s}={best[(name, s)]:6.2f}s" for s in shapes)
        print(f"{name:28s} {row}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
