"""Round-16 optimization: contention-immune adjudication of one query.

Usage: python tools/opt_cpu_probe.py <query> [trials]

Runs the query via the noop sink with the Spark UI enabled and sums
executor run/cpu/GC time and input/shuffle bytes across its stages
(same REST fields as bench.py's _MetricsProbe). Executor cpu_ms at
identical input bytes is the round's tie-breaker when wall-clock noise
swamps an A/B (OPTIMIZATION_r16.md "Measurement notes").
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FIELDS = [
    ("executorRunTime", "run_ms", 1),
    ("executorCpuTime", "cpu_ms", 1_000_000),
    ("jvmGcTime", "gc_ms", 1),
    ("inputBytes", "input_b", 1),
    ("shuffleWriteBytes", "shuffle_w_b", 1),
]


def stages(base: str, app: str) -> list[dict]:
    url = f"{base}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=10) as resp:
        return json.loads(resp.read())


def main() -> int:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        "opt_cpu_probe",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
            "spark.ui.enabled": "true",
        },
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl
    app = sc.applicationId
    fn = QUERIES[name]
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    mark = max((s["stageId"] for s in stages(base, app)), default=-1)
    t0 = time.perf_counter()
    for _ in range(trials):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    out = {alias: 0 for _, alias, _ in FIELDS}
    n = 0
    for s in stages(base, app):
        if s["stageId"] <= mark or s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        n += 1
        for field, alias, div in FIELDS:
            out[alias] += int(s.get(field, 0) or 0) // div
    out["stages"] = n
    out["wall_s"] = round(wall, 3)
    out["trials"] = trials
    print(json.dumps({name: out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
