"""Reproducible flood probe for the embedding pair stage (r11).

Plants an identical-vector flood in the sf0.1 embedding corpus, runs the
SemDeDup cell assignment, then times the in-cell pair stage twice —
``collapse="off"`` (direct enumeration: the flood pays copies²/2 cosine
scores and emits that many pairs) vs ``collapse="star"`` (the default
dedup route: one representative per identical-vector group, star edges
back to members — linear in the flood, component-/kill-rule-exact for
every downstream keep rule the engine ships).

Reference run on this container (2026-08-16, quiet box, 10,000 copies):

    collapse=star: 2.4 s,  11,214 pairs
    collapse=off: 77.6 s,  50,096,214 pairs

Usage (quiet box — same contention caveats as bench.py):

    python tools/flood_probe.py             # 10,000-copy flood
    python tools/flood_probe.py --copies 3000
"""

from __future__ import annotations

import math
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402

from automotive_data_pipeline_demo_spark.extensions.similarity import (  # noqa: E402
    embedding_near_dup_pairs,
    kmeans_lloyd,
)
from automotive_data_pipeline_demo_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    copies = 10_000
    if "--copies" in sys.argv:
        copies = int(sys.argv[sys.argv.index("--copies") + 1])
    spark = get_spark(app_name="flood_probe")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n0 = emb.count()
    flood = (
        emb.filter(F.col("vec_id") == 3)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("i"),
            "embedding",
        )
        .select((F.col("i") + 1_000_000).alias("vec_id"), "embedding")
    )
    # localCheckpoint: both timed modes must read identical, already-built
    # inputs so the probe isolates the pair stage
    corpus = (
        emb.select("vec_id", "embedding")
        .unionByName(flood)
        .localCheckpoint(eager=True)
    )
    n = corpus.count()
    k = max(8, math.ceil(n / 128))
    seeds = corpus.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_vec"),
    )
    assign = kmeans_lloyd(corpus, seeds, n_iter=1, route_probe=2)
    cells = corpus.join(assign, "vec_id").localCheckpoint(eager=True)
    print(f"corpus {n} vecs ({n0} real + {copies}-copy flood), k={k}")
    for mode in ("star", "off"):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        cnt = embedding_near_dup_pairs(
            cells,
            threshold=0.30,
            block_col="centroid_id",
            collapse=mode,
            max_cell_size=None,
        ).count()
        print(
            f"collapse={mode}: {round(time.perf_counter() - t0, 2)}s,"
            f" {cnt} pairs"
        )
    spark.stop()


if __name__ == "__main__":
    main()
