"""Round-17 optimization: per-query job timeline attribution.

Usage: python tools/opt_job_timeline.py <query> [trials]

Times one bench trial like bench.py (build fn(spark, SF_DIR) + noop sink)
with the UI REST endpoint on, then splits the trial wall into:
  - build_s: driver-side DataFrame construction (py4j + analysis + any
    eager localCheckpoint jobs run during construction)
  - jobs:    per-job (submission -> completion) wall, name, stage count
  - gap_s:   action wall minus the union of job intervals = driver-side
    scheduling/AQE re-planning time between jobs

The gap number is the round's target: guide SS1.2 says fix the dominant
term wherever it lives, and at gate scale the dominant term of most keys
is no longer executor work.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(base: str, app: str) -> list[dict]:
    url = f"{base}/api/v1/applications/{app}/jobs"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read())


def _ts(s: str) -> float:
    # "2026-08-18T21:00:00.123GMT"
    return (
        datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .astimezone(timezone.utc)
        .timestamp()
    )


def main() -> int:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "opt_job_timeline",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            "spark.ui.enabled": "true",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    fn = QUERIES[name]
    # warm pass
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for t in range(trials):
        wm = max((j["jobId"] for j in _jobs(base, app)), default=-1)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_done = time.perf_counter()
        try:
            bus = spark.sparkContext._jsc.sc().listenerBus()  # noqa: SLF001
            bus.waitUntilEmpty()
        except Exception:  # noqa: BLE001
            time.sleep(0.3)
        jobs = [j for j in _jobs(base, app) if j["jobId"] > wm]
        jobs.sort(key=lambda j: j["jobId"])
        spans = []
        for j in jobs:
            try:
                s, e = _ts(j["submissionTime"]), _ts(j["completionTime"])
            except (KeyError, ValueError):
                continue
            spans.append(
                (j["jobId"], s, e, j.get("numTasks", 0),
                 (j.get("name") or "")[:60])
            )
        total_job = sum(e - s for _, s, e, _, _ in spans)
        # union of job intervals (jobs can overlap under AQE)
        merged: list[list[float]] = []
        for _, s, e, _, _ in sorted(spans, key=lambda x: x[1]):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        union_job = sum(e - s for s, e in merged)
        wall = t_done - t0
        build = t_build - t0
        action = t_done - t_build
        print(
            f"trial {t}: wall {wall:.3f}s = build {build:.3f}s + action "
            f"{action:.3f}s | jobs {len(spans)} (sum {total_job:.3f}s, "
            f"union {union_job:.3f}s, inter-job gap "
            f"{max(action - union_job, 0):.3f}s)"
        )
        for jid, s, e, ntask, jname in spans:
            print(f"    job {jid:>4} {e - s:7.3f}s  tasks={ntask:<4} {jname}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
