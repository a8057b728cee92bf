#!/usr/bin/env python
"""Profile a lifecycle row's build/serve: run with the Spark event log
on, then print per-job wall, the inter-job driver gaps, and the
phase totals — the §7.3 "driver-side work shows up as nothing
running" diagnosis, made quantitative.

Usage:
    python tools/profile_build.py <query> [<query> ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    evdir = tempfile.mkdtemp(prefix="sg_eventlog_")

    from rds_to_datalake_project_spark.plans.registry import PHASES, QUERIES
    from rds_to_datalake_project_spark.session import get_spark

    spark = get_spark(
        app_name="profile_build",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    QUERIES["order_priority_stats"](spark, sf_dir).count()  # warm

    marks = []  # (label, t_start_ms, t_end_ms)
    for name in names:
        spark.catalog.clearCache()
        if name in PHASES:
            build, serve = PHASES[name]
            t0 = time.time() * 1000
            h = build(spark, sf_dir)
            t1 = time.time() * 1000
            marks.append((f"{name}:build", t0, t1))
            serve(spark, sf_dir, h).count()
            marks.append((f"{name}:serve", t1, time.time() * 1000))
        else:
            t0 = time.time() * 1000
            QUERIES[name](spark, sf_dir).count()
            marks.append((f"{name}", t0, time.time() * 1000))
    spark.stop()

    logs = []
    for root, _dirs, files in os.walk(evdir):
        logs.extend(
            os.path.join(root, f) for f in files if "appstatus" not in f
        )
    jobs = []  # (start_ms, end_ms, job_id, description)
    starts: dict[int, tuple] = {}
    for lf in logs:
        for line in open(lf, errors="replace"):
            try:
                ev = json.loads(line)
            except Exception:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                starts[ev["Job ID"]] = (
                    ev["Submission Time"],
                    props.get("spark.job.description")
                    or props.get("callSite.short", ""),
                )
            elif ev.get("Event") == "SparkListenerJobEnd":
                st = starts.pop(ev["Job ID"], None)
                if st:
                    jobs.append((st[0], ev["Completion Time"], ev["Job ID"], st[1]))
    jobs.sort()

    for label, t0, t1 in marks:
        span = [j for j in jobs if j[0] >= t0 - 5 and j[1] <= t1 + 5]
        wall = (t1 - t0) / 1000
        jtime = sum(j[1] - j[0] for j in span) / 1000
        print(f"\n== {label}: wall {wall:.2f}s, {len(span)} jobs, "
              f"job-time {jtime:.2f}s, gaps {wall - jtime:.2f}s")
        prev = t0
        for (s, e, jid, desc) in span:
            gap = (s - prev) / 1000
            print(f"  gap {gap:6.3f}s | job {jid:4d} {(e - s)/1000:6.3f}s  "
                  f"{(desc or '')[:90]}")
            prev = e
        print(f"  gap {(t1 - prev)/1000:6.3f}s | (end)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
