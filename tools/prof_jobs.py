#!/usr/bin/env python
"""Per-round Spark job census for the crawl engine.

Runs a small crawl with the UI REST API enabled and prints, per round and
stage label (r{N}:{submit,dispatch,fetch,parse,commit}), how many Spark
jobs the driver submitted and their total wall time. Every job is a
scheduling barrier plus py4j chatter — the census is the denominator for
the serial-term attack (VERDICT r3 item 1): fewer jobs per round is the
lever that survives any host window, healthy or degraded.

Usage: python tools/prof_jobs.py [n_domains pages_per_domain [cores]]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ppd = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cores = sys.argv[3] if len(sys.argv) > 3 else "2"
    os.environ["SPARK_GRAFT_CPUS"] = cores
    os.environ.setdefault(
        "SPARK_GRAFT_CONF", "spark.ui.enabled=true;spark.ui.port=4049"
    )
    import bench
    from colly_spark.session import build_session

    spark = build_session("prof-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    out = bench.crawl_bench(spark, nd, ppd)
    wall = time.time() - t0
    ui = spark.sparkContext.uiWebUrl
    jobs = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}/jobs?status=succeeded").read()
    )
    agg: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
    for j in jobs:
        desc = j.get("description") or j.get("name", "?")
        # normalize "r0:submit" style labels; fixture-building jobs keep
        # their raw name
        key = desc if desc.startswith("r") and ":" in desc else f"pre:{desc[:40]}"
        a = agg[key]
        a[0] += 1
        dur = 0.0
        if j.get("submissionTime") and j.get("completionTime"):
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            # REST serves GMT-suffixed ISO; parse tolerant
            def p(s: str) -> float:
                import datetime as dt
                return dt.datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()
            dur = p(j["completionTime"]) - p(j["submissionTime"])
        a[1] += dur
    print(json.dumps(out, default=str))
    print(f"total wall {wall:.1f}s, {len(jobs)} jobs")
    stage_tot: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])
    for k in sorted(agg):
        n, d = agg[k]
        print(f"{k:28s} jobs={int(n):3d} job-wall={d:7.2f}s")
        stage = k.split(":", 1)[1] if k.startswith("r") and ":" in k else "pre"
        stage_tot[stage][0] += n
        stage_tot[stage][1] += d
    print("--- by stage (all rounds) ---")
    for k in sorted(stage_tot):
        n, d = stage_tot[k]
        print(f"{k:12s} jobs={int(n):3d} job-wall={d:7.2f}s")
    if os.environ.get("PROF_JOBS_DETAIL"):
        print("--- every labeled job (action census) ---")
        stages = {
            s["stageId"]: s
            for s in json.loads(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{spark.sparkContext.applicationId}/stages"
                ).read()
            )
        }
        for j in jobs:
            desc = j.get("description") or ""
            if desc.startswith("r") and ":" in desc:
                print(f"{desc:14s} jid={j['jobId']:4d} tasks={j.get('numTasks', -1):4d} "
                      f"{j.get('name', '?')[:60]}")
                for sid in sorted(j.get("stageIds", [])):
                    s = stages.get(sid)
                    if s is not None:
                        print(f"    stage {sid:4d} [{s.get('status','?'):9s}] "
                              f"tasks={s.get('numTasks', -1):4d} {s.get('name','?')[:70]}")
    spark.stop()


if __name__ == "__main__":
    main()
