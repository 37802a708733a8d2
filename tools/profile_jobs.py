"""Per-query Spark JOB breakdown — the guide §1.1 empirical loop.

For each named registry query: build it (timed), run the bench's timed
action (toPandas), then read the local UI REST API
(http://localhost:4040/api/v1) for every job the query submitted —
duration, stage count, task count, description. Jobs are attributed to
a query with setJobGroup, so build-time jobs (eager checkpoints, model
fits) and run-time jobs are both captured and labeled by phase.

Usage: python tools/profile_jobs.py [sf_dir] query [query ...]
Output: one line per job + a per-query summary (n_jobs, job seconds vs
wall seconds — the gap is driver/py4j/planning time that no job shows).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from ethereum_analytical_db_spark.session import get_spark


def api(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="profile-jobs",
        cpus=cpus,
        extra_conf={
            # the session factory disables the UI; the REST API is the
            # point of this tool
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl  # e.g. http://host:4040
    if base is None:
        raise SystemExit("Spark UI not available; cannot profile jobs")
    app_id = sc.applicationId
    qs = entry_mod.queries()

    # warm the JVM/session the way bench.py's calibration does, so the
    # first profiled query isn't charged session-start costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    repeat = int(os.environ.get("PROFILE_REPEAT", "2"))
    for name in names:
        fn = qs[name]
        # run (repeat) times, profile the LAST — steady-state, no JVM
        # warm-up or cold Python workers charged to the profiled pass
        for _ in range(max(repeat - 1, 0)):
            fn(spark, sf_dir).toPandas()
        sc.setJobGroup(f"build:{name}", f"build {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        sc.setJobGroup(f"run:{name}", f"run {name}")
        df.toPandas()
        t2 = time.perf_counter()
        sc.setJobGroup("idle", "idle")

        jobs = api(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded")
        mine = [
            j
            for j in jobs
            if j.get("jobGroup") in (f"build:{name}", f"run:{name}")
        ]
        mine.sort(key=lambda j: j["jobId"])
        job_sec = {"build": 0.0, "run": 0.0}
        print(f"\n=== {name}: build {t1-t0:.3f}s  run {t2-t1:.3f}s ===")
        for j in mine:
            import datetime as dt

            st = dt.datetime.strptime(
                j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%f%Z"
            )
            ct = dt.datetime.strptime(
                j["completionTime"], "%Y-%m-%dT%H:%M:%S.%f%Z"
            )
            dur = (ct - st).total_seconds()
            phase = "build" if j["jobGroup"].startswith("build:") else "run"
            job_sec[phase] += dur
            print(
                f"  [{phase}] job {j['jobId']:>4} {dur:6.3f}s "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']:>5} "
                f"{(j.get('description') or j.get('name') or '')[:90]}"
            )
        wall = {"build": t1 - t0, "run": t2 - t1}
        for ph in ("build", "run"):
            gap = wall[ph] - job_sec[ph]
            print(
                f"  {ph}: {len([j for j in mine if j['jobGroup'] == f'{ph}:{name}'])} jobs, "
                f"job-time {job_sec[ph]:.3f}s, wall {wall[ph]:.3f}s, "
                f"driver gap {gap:.3f}s"
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
