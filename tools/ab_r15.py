#!/usr/bin/env python
"""Cold-JVM, driver-methodology interleaved A/B (r15).

Why this exists: r14's in-process warm A/Bs (tools/ab_shapes_r14.py)
measured the persist/eager_fill shapes as wins-or-neutral, while the
driver's ground-truth bench — COLD JVM, min-of-2 per entry, fresh
session per round — measured the same three entries 11-13% SLOWER
(VERDICT r14 finding 1). The gap is methodology: an extra action
(eager_fill's count) and an extra cached plan cost codegen/first-run
time that a warm in-process loop amortizes away and a cold session
pays in full. This harness measures what the driver measures:

- each (variant, session) is a FRESH subprocess/JVM;
- inside a session: flagship warmup, then per entry min-of-2 timed
  noop saves with clearCache between runs (bench.py's run_suite,
  verbatim methodology), plus the multi-core canary for stall
  detection;
- variants alternate round-robin ACROSS sessions so box drift hits all
  variants alike; compare min-over-sessions per (variant, entry).

Variants are expressed as env assignments consumed by the knobs in the
package (SPARK_GRAFT_SHARE_MARKED / SPARK_GRAFT_DRIFT_PIN /
SPARK_GRAFT_SCRUB_PIN / SPARK_GRAFT_FAN_OUT).

Usage:
    python tools/ab_r15.py --sessions 4 \
        --entries x_dedup_semdedup_inc,x_dedup_semdedup_drift \
        --variants 'fill:;off:SPARK_GRAFT_SHARE_MARKED=off' \
        [--sf /root/testdata/sf0.1] [--out /tmp/ab_r15.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["AB_ROOT"])
from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG
from automotive_data_pipeline_demo_spark.session import get_spark

entries = os.environ["AB_ENTRIES"].split(",")
sf_dir = os.environ["AB_SF_DIR"]
by_name = {s.name: s for s in CATALOG}
spark = get_spark(app_name="ab_r15")

# identical warmup to bench.py's run_suite (configurable: the probe
# corpus has only documents/embeddings, so flagship can't build there)
warm = os.environ.get("AB_WARM", "flagship_segments")
by_name[warm].build(spark, sf_dir).write.format(
    "noop").mode("overwrite").save()

out = {}
for name in entries:
    spec = by_name[name]
    best = float("inf")
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)

# multi-core canary (bench.py host_canary_mc, min-of-2 after warm) for
# stall detection: a session whose canary is way off its siblings is a
# box artifact, not a shape signal
from pyspark.sql import functions as F
li = spark.read.parquet(f"{sf_dir.rstrip('/')}/lineitem.parquet") \
    if os.path.exists(f"{sf_dir.rstrip('/')}/lineitem.parquet") \
    else None
if li is None:
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
q = (
    li.withColumn("__k", F.explode(F.sequence(F.lit(1), F.lit(8))))
    .repartition(64, "l_orderkey", "__k")
    .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    .groupBy("l_returnflag", "l_linestatus", "__k")
    .agg(F.sum("l_quantity").alias("sum_qty"),
         F.count(F.lit(1)).alias("n"))
)
cbest = float("inf")
for i in range(3):
    t0 = time.perf_counter()
    q.write.format("noop").mode("overwrite").save()
    if i > 0:
        cbest = min(cbest, time.perf_counter() - t0)
print("ABJSON:" + json.dumps({"queries": out, "canary_mc": round(cbest, 3)}))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--entries", required=True)
    ap.add_argument("--variants", required=True,
                    help="'name:K=V,K2=V2;name2:...' ('' env = baseline)")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", default="flagship_segments")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    variants: dict[str, dict[str, str]] = {}
    for part in args.variants.split(";"):
        name, _, envs = part.partition(":")
        env = {}
        for kv in envs.split(","):
            if kv:
                k, _, v = kv.partition("=")
                env[k] = v
        variants[name] = env

    results: dict[str, list[dict]] = {v: [] for v in variants}
    t_start = time.time()
    for s in range(args.sessions):
        for vname, venv in variants.items():
            env = {**os.environ, **venv,
                   "AB_ROOT": _ROOT, "AB_ENTRIES": args.entries,
                   "AB_SF_DIR": args.sf, "AB_WARM": args.warm,
                   "PYTHONPATH": _ROOT}
            t0 = time.time()
            res = subprocess.run(
                [sys.executable, "-c", _RUNNER], capture_output=True,
                text=True, timeout=3600, env=env, cwd=_ROOT,
            )
            payload = None
            for line in res.stdout.splitlines():
                if line.startswith("ABJSON:"):
                    payload = json.loads(line[len("ABJSON:"):])
            if payload is None:
                print(f"s{s} {vname}: RUNNER FAILED\n{res.stderr[-2000:]}",
                      flush=True)
                continue
            payload["wall"] = round(time.time() - t0, 1)
            results[vname].append(payload)
            qs = " ".join(f"{k}={v:.2f}" for k, v in
                          payload["queries"].items())
            print(f"s{s} {vname:8s} canary={payload['canary_mc']:.2f} "
                  f"wall={payload['wall']:.0f}s  {qs}", flush=True)

    print(f"\n== min-over-{args.sessions}-cold-sessions "
          f"({round(time.time() - t_start)}s total) ==")
    entries = args.entries.split(",")
    header = "entry".ljust(28) + "".join(v.rjust(10) for v in variants)
    print(header)
    table: dict[str, dict[str, float]] = {}
    for e in entries:
        row = {}
        for v in variants:
            vals = [r["queries"][e] for r in results[v] if e in r["queries"]]
            row[v] = min(vals) if vals else float("nan")
        table[e] = row
        print(e.ljust(28) + "".join(f"{row[v]:10.3f}" for v in variants))
    canaries = {v: [r["canary_mc"] for r in results[v]] for v in variants}
    print("canaries:", json.dumps(canaries))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as fh:
            json.dump({"table": table, "raw": results,
                       "sf": args.sf, "entries": entries}, fh, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
