"""Round-17 optimization: per-stage task-duration skew for one query.

Usage: python tools/opt_stage_tasks.py <query>

Runs one warm noop-sink trial and prints, per stage: task count, max /
median task duration, and the dominant task's metric split (cpu,
shuffle write, scheduler overhead) — tells serial-decode floors (one
task owns the stage) apart from scheduling floors (many tiny tasks).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    name = sys.argv[1]
    spark = get_spark(
        "opt_stage_tasks",
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
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm

    def stages():
        url = f"{base}/api/v1/applications/{app}/stages"
        with urllib.request.urlopen(url, timeout=10) as resp:
            return json.loads(resp.read())

    wm = max((s["stageId"] for s in stages()), default=-1)
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    try:
        bus = spark.sparkContext._jsc.sc().listenerBus()  # noqa: SLF001
        bus.waitUntilEmpty()
    except Exception:  # noqa: BLE001
        import time

        time.sleep(0.3)
    for s in sorted(stages(), key=lambda x: x["stageId"]):
        if s["stageId"] <= wm or s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        sid, att = s["stageId"], s["attemptId"]
        url = (f"{base}/api/v1/applications/{app}/stages/{sid}/{att}"
               f"/taskSummary?quantiles=0.5,1.0")
        try:
            with urllib.request.urlopen(url, timeout=10) as resp:
                q = json.loads(resp.read())
        except Exception:  # noqa: BLE001
            q = {}
        dur = q.get("duration", [0, 0])
        cpu = [v / 1e6 for v in q.get("executorCpuTime", [0, 0])]
        run = q.get("executorRunTime", [0, 0])
        deser = q.get("executorDeserializeTime", [0, 0])
        sw = q.get("shuffleWriteTime", [0, 0])
        print(
            f"stage {sid:>4} tasks={s.get('numCompleteTasks', 0):<4} "
            f"wall={ (s.get('executorRunTime',0)):>6}ms-sum "
            f"dur[med/max]={dur[0]:.0f}/{dur[-1]:.0f}ms "
            f"run[max]={run[-1]:.0f} cpu[max]={cpu[-1]:.0f} "
            f"deser[max]={deser[-1]:.0f} "
            f"swrite[max]={sw[-1]/1e6:.0f}ms "
            f"in={s.get('inputBytes',0)//1024}KB "
            f"shw={s.get('shuffleWriteBytes',0)//1024}KB  "
            f"{(s.get('description') or s.get('name') or '')[:50]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
