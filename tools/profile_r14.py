#!/usr/bin/env python
"""Per-entry job/stage profiler for the r14 optimization round.

Runs named catalog entries (default: the bench set) against
$SPARK_GRAFT_SF_DIR with Spark event logging enabled, then parses the
event log to attribute wall clock to jobs and stages — per-stage task
time, shuffle read/write bytes, input bytes, GC — so optimization
targets the measured cost, not guesses (guide §1).

    SPARK_GRAFT_SF_DIR=/tmp/spark_graft_sf1 python tools/profile_r14.py \
        x_curation_e2e x_dedup_simhash_dedup

Writes a text report to stdout and (with --plans DIR) the
explain("formatted") of each entry to DIR/<name>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

EVDIR = "/tmp/spark-events-r14"


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}TB"


def _event_lines(path: str):
    """Yield event-log JSON lines from a plain file or a Spark 4 rolling
    event-log directory (eventlog_v2_*/events_N_*)."""
    import glob as _glob

    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "events_*")),
            key=lambda p: int(os.path.basename(p).split("_")[1]),
        )
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            import io

            import pyarrow as pa

            with pa.input_stream(f, compression="zstd") as raw:
                yield from io.TextIOWrapper(
                    io.BytesIO(raw.read()), encoding="utf-8"
                )
            continue
        with open(f, encoding="utf-8") as fh:
            yield from fh


def parse_eventlog(path: str) -> dict:
    """job id -> {desc, ms, stages: {sid: metrics}}; stage metrics summed
    over task ends."""
    jobs: dict[int, dict] = {}
    stage_of: dict[int, int] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in _event_lines(path):
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {
                    "desc": desc,
                    "t0": ev.get("Submission Time", 0),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
                for s in ev.get("Stage Infos", []):
                    stage_of[s["Stage ID"]] = jid
                    stages.setdefault(
                        s["Stage ID"],
                        {"name": s.get("Stage Name", ""), "tasks": 0,
                         "task_ms": 0, "gc_ms": 0, "input_b": 0,
                         "sh_read_b": 0, "sh_write_b": 0, "spill_b": 0,
                         "wall_ms": 0, "records": 0},
                    )
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["ms"] = ev.get("Completion Time", 0) - jobs[jid]["t0"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {"name": si.get("Stage Name", ""),
                                             "tasks": 0, "task_ms": 0,
                                             "gc_ms": 0, "input_b": 0,
                                             "sh_read_b": 0, "sh_write_b": 0,
                                             "spill_b": 0, "wall_ms": 0,
                                             "records": 0})
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    st["wall_ms"] = comp - sub
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {"name": "", "tasks": 0,
                                             "task_ms": 0, "gc_ms": 0,
                                             "input_b": 0, "sh_read_b": 0,
                                             "sh_write_b": 0, "spill_b": 0,
                                             "wall_ms": 0, "records": 0})
                st["tasks"] += 1
                st["task_ms"] += tm.get("Executor Run Time", 0)
                st["gc_ms"] += tm.get("JVM GC Time", 0)
                im = tm.get("Input Metrics") or {}
                st["input_b"] += im.get("Bytes Read", 0)
                st["records"] += im.get("Records Read", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["sh_read_b"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                swm = tm.get("Shuffle Write Metrics") or {}
                st["sh_write_b"] += swm.get("Shuffle Bytes Written", 0)
                st["spill_b"] += tm.get("Disk Bytes Spilled", 0)
    for sid, jid in stage_of.items():
        jobs.get(jid, {}).setdefault("stage_metrics", {})[sid] = stages.get(sid)
    return jobs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--min-job-ms", type=int, default=50)
    args = ap.parse_args()

    os.makedirs(EVDIR, exist_ok=True)
    for f in os.listdir(EVDIR):
        try:
            os.remove(os.path.join(EVDIR, f))
        except OSError:
            pass

    from automotive_data_pipeline_demo_spark.plans.catalog import CATALOG
    from automotive_data_pipeline_demo_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_r14",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVDIR}",
        },
    )
    by_name = {s.name: s for s in CATALOG}
    names = args.entries or [s.name for s in CATALOG if s.bench]
    bad = [n for n in names if n not in by_name]
    if bad:
        print(f"unknown entries: {bad}", file=sys.stderr)
        return 2

    walls: dict[str, list[float]] = {}
    for name in names:
        spec = by_name[name]
        walls[name] = []
        for r in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"__prof__::{name}::run{r}")
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            walls[name].append(wall)
            spark.sparkContext.setJobDescription(None)
            if r == 0:
                print(f"## {name}: build {t_build:.2f}s", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"__plan__::{name}")
            df = spec.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.tag}.txt"),
                "w", encoding="utf-8",
            ) as fh:
                fh.write(plan)
            spark.sparkContext.setJobDescription(None)

    # flush the event log
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)
    ev_path = os.path.join(EVDIR, app_id)
    if not os.path.exists(ev_path):
        cands = [os.path.join(EVDIR, f) for f in os.listdir(EVDIR)]
        ev_path = max(cands, key=os.path.getmtime) if cands else None
    jobs = parse_eventlog(ev_path) if ev_path else {}

    print("\n==== per-entry wall (all runs) ====")
    for name in names:
        w = walls[name]
        print(f"{min(w):7.3f}s  {name}  (runs: {' '.join(f'{x:.2f}' for x in w)})")

    print("\n==== job breakdown (run with the MIN wall per entry) ====")
    best_run = {n: min(range(len(walls[n])), key=lambda i: walls[n][i])
                for n in names}
    for name in names:
        tag = f"__prof__::{name}::run{best_run[name]}"
        rows = [(jid, j) for jid, j in jobs.items() if j.get("desc") == tag]
        if not rows:
            continue
        print(f"\n-- {name} (run{best_run[name]}, {min(walls[name]):.3f}s, "
              f"{len(rows)} jobs)")
        for jid, j in sorted(rows):
            ms = j.get("ms", 0)
            if ms < args.min_job_ms:
                continue
            sm = j.get("stage_metrics", {}) or {}
            parts = []
            for sid, st in sorted(sm.items()):
                if not st or st["tasks"] == 0:
                    continue
                seg = (f"s{sid}[{st['tasks']}t {st['task_ms']}ms"
                       f" in={fmt_bytes(st['input_b'])}")
                if st["sh_read_b"]:
                    seg += f" sr={fmt_bytes(st['sh_read_b'])}"
                if st["sh_write_b"]:
                    seg += f" sw={fmt_bytes(st['sh_write_b'])}"
                if st["gc_ms"] > 100:
                    seg += f" gc={st['gc_ms']}ms"
                if st["spill_b"]:
                    seg += f" spill={fmt_bytes(st['spill_b'])}"
                seg += "]"
                parts.append(seg)
            print(f"  job{jid:<4} {ms:6d}ms  {' '.join(parts)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
