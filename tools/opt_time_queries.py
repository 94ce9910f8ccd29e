"""Round-16 optimization: time individual queries via the noop sink.

Usage: python tools/opt_time_queries.py [query ...]   (default: HEADLINE)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_TRIALS (default 3).

Same methodology as bench.py's query segment (noop sink, best-of-N with
median/spread), but standalone and selectable so one operator can be
re-measured in isolation while iterating. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = get_spark(
        "opt_time_queries",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()  # warmup
    out: dict[str, dict] = {}
    warmup = os.environ.get("SPARK_GRAFT_TIME_WARMUP", "1") == "1"
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        if warmup:  # untimed run: JVM/codegen/Python-worker spin-up
            try:
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001
                pass
        trials: list[float] = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            try:
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                print(f"# {name} FAILED: {exc!r}"[:500], file=sys.stderr)
                break
            trials.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        if trials:
            st = sorted(trials)
            out[name] = {
                "min": st[0],
                "median": st[len(st) // 2],
                "spread": round(st[-1] / st[0], 2),
                "trials": trials,
            }
        else:
            out[name] = {"min": -1.0}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf": SF_DIR, "trials": TRIALS, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
