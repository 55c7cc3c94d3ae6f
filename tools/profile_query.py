"""Per-job / per-stage wall-clock profile of one registry query.

Runs ``queries()[name]`` at ``--sf`` through the noop sink (guide
§1.4), once cold then ``--warm`` warm runs, with the Spark event log
enabled, then parses the event log into per-job and per-stage wall
times and task-metric aggregates for the LAST warm run. This is the
local stand-in for the Spark UI's stage page (the UI is disabled in
``session.get_spark``): it answers "which job/stage inside this 5 s
query actually costs the seconds" — the guide-§1 empirical loop.

Usage:
  python tools/profile_query.py tokenizer_pack_chat [--sf DIR] [--warm 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    evdir = f"/tmp/sparkevents_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)

    from mriya_spark.caching import release_caches
    from mriya_spark.session import get_spark

    spark = get_spark(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sc = spark.sparkContext

    # same warmups as bench.py so cold numbers are comparable
    for t in ("nation", "lineitem", "orders", "customer", "documents"):
        spark.read.parquet(f"{args.sf}/{t}.parquet").count()

    report: dict[str, dict] = {}
    for name in args.names:
        fn = qs[name]
        timings = []
        marks = []
        for i in range(1 + args.warm):
            release_caches()
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            timings.append(round(time.time() - t0, 3))
            marks.append((t0, time.time()))
        sc.setJobDescription(None)
        report[name] = {"cold": timings[0], "warm": timings[1:],
                        "last_warm_window": marks[-1]}

    # flush the event log
    appid = sc.applicationId
    spark.stop()

    def _ev_lines():
        # Spark 4 rolling layout: eventlog_v2_<appid>/events_N_<appid>[.codec]
        rolldir = os.path.join(evdir, f"eventlog_v2_{appid}")
        if os.path.isdir(rolldir):
            parts = sorted(
                p for p in os.listdir(rolldir) if p.startswith("events_")
            )
            for p in parts:
                path = os.path.join(rolldir, p)
                if p.endswith(".zstd"):
                    import subprocess

                    out = subprocess.run(
                        ["zstdcat", path], capture_output=True, text=True
                    )
                    yield from out.stdout.splitlines()
                else:
                    with open(path) as fh:
                        yield from fh
            return
        evfile = os.path.join(evdir, appid)
        if not os.path.exists(evfile):
            cands = [p for p in os.listdir(evdir) if p.startswith(appid)]
            if cands:
                evfile = os.path.join(evdir, cands[0])
        with open(evfile) as fh:
            yield from fh

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in _ev_lines():
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"] / 1000.0,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j:
                    j["t1"] = ev["Completion Time"] / 1000.0
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stages[sid] = {
                    "name": si.get("Stage Name", "")[:120],
                    "tasks": si.get("Number of Tasks"),
                    "t0": si.get("Submission Time", 0) / 1000.0,
                    "t1": si.get("Completion Time", 0) / 1000.0,
                }

    out = {}
    for name, rec in report.items():
        w0, w1 = rec["last_warm_window"]
        qjobs = []
        covered = 0.0
        for jid, j in sorted(jobs.items()):
            if "t1" not in j or j["t1"] < w0 or j["t0"] > w1:
                continue
            dur = round(j["t1"] - j["t0"], 3)
            covered += dur
            jstages = []
            for sid in j["stages"]:
                s = stages.get(sid)
                if s and s["t1"] >= w0:
                    jstages.append(
                        {"stage": sid, "dur": round(s["t1"] - s["t0"], 3),
                         "tasks": s["tasks"], "name": s["name"]}
                    )
            jstages.sort(key=lambda x: -x["dur"])
            qjobs.append({"job": jid, "dur": dur, "stages": jstages[:6]})
        out[name] = {
            "cold": rec["cold"],
            "warm": rec["warm"],
            "n_jobs_last_warm": len(qjobs),
            "job_time_sum": round(covered, 3),
            "gap_time": round((w1 - w0) - covered, 3),
            "jobs": qjobs,
        }

    text = json.dumps(out, indent=1)
    print(text)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
