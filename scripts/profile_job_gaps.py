"""Dev tool: job-level timeline of ONE pipeline run — per-job durations
plus the INTER-JOB GAPS (driver-only time: planning, Python driver code,
checkpoint coordination, AQE replan rounds).  The stage profilers time
whole stages; the ~70 s input-size-independent tail that caps N-vs-4N
scaling (Amdahl solve on the 80k 4v16 pairs, BENCH/BASELINE.md Run V) is
composed of exactly these gaps plus the floors of KB-scale jobs, so this
is the map for cutting it.  Run exclusively on a quiet box.

Reads the live Spark UI REST API after the timed run; jobs may overlap
(AQE broadcast-exchange jobs run concurrently), so gap = time where NO
job was running (pure driver time), computed by interval union.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PJG_CPUS", "16"))
N = int(os.environ.get("PJG_DOCS", "80000"))


def _ts(s: str) -> float:
    # "2026-08-19T19:45:00.123GMT"
    return (dt.datetime.strptime(s.replace("GMT", "+0000"),
                                 "%Y-%m-%dT%H:%M:%S.%f%z").timestamp())


def main() -> None:
    from inclusionreferenceskg_spark import synth
    from inclusionreferenceskg_spark.plans.pipeline import run_pipeline
    from inclusionreferenceskg_spark.session import get_spark

    spark = get_spark("pjg", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    run_pipeline(synth.synthesize_pages(spark, 64, partitions=16)) \
        .triples.count()

    default_parts = max(min(max(CPUS * 4, 64), max(N // 64, 8)), 8)
    pages = synth.synthesize_pages(spark, N, partitions=default_parts)
    spark.catalog.clearCache()

    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]

    def jobs_after(t_wall: float) -> list[dict]:
        raw = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"))
        out = []
        for j in raw:
            sub = _ts(j["submissionTime"])
            if sub >= t_wall - 0.05 and "completionTime" in j:
                out.append({"id": j["jobId"],
                            "name": (j.get("description")
                                     or j["name"])[:90],
                            "sub": sub, "end": _ts(j["completionTime"]),
                            "tasks": j["numCompletedTasks"]})
        return sorted(out, key=lambda j: j["sub"])

    t0_wall = time.time()
    t0 = time.perf_counter()
    n = run_pipeline(pages).triples.count()
    wall = time.perf_counter() - t0
    time.sleep(0.5)
    jobs = jobs_after(t0_wall)

    print(f"docs={N} cpus={CPUS} wall={wall:.2f}s triples={n} "
          f"jobs={len(jobs)}")

    # interval union of job activity -> driver-only time = wall - covered
    ivals = sorted((j["sub"], j["end"]) for j in jobs)
    covered, cur_s, cur_e = 0.0, None, None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    print(f"job-covered time: {covered:.2f}s   "
          f"driver-only (no job running): {wall - covered:.2f}s")

    # the gaps themselves, attributed to the job that follows them
    prev_end = t0_wall
    gaps = []
    for j in jobs:
        g = j["sub"] - prev_end
        if g > 0.05:
            gaps.append((g, j))
        prev_end = max(prev_end, j["end"])
    print("\ntop driver gaps (before job):")
    for g, j in sorted(gaps, reverse=True)[:15]:
        print(f"  {g:6.2f}s -> job {j['id']:4d} {j['name']}")

    print("\ntop jobs by duration:")
    for j in sorted(jobs, key=lambda j: j["end"] - j["sub"],
                    reverse=True)[:15]:
        print(f"  {j['end'] - j['sub']:7.2f}s  job {j['id']:4d} "
              f"tasks={j['tasks']:5d} {j['name']}")
    spark.stop()


if __name__ == "__main__":
    main()
