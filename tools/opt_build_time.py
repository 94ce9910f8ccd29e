"""Round-16 optimization: time driver-side DataFrame CONSTRUCTION per key.

Usage: python tools/opt_build_time.py [query ...]   (default: HEADLINE)

Times `QUERIES[name](spark, sf_dir)` alone — py4j round trips + eager
Catalyst analysis — with no action, isolating the driver-side build tax
(guide §1 / OPTIMIZATION_r16.md §14) from execution. Each key is built
once untimed (warm caches: schema memo, relation resolution), then
best-of-N timed builds. Prints one JSON line sorted by build seconds.
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
    spark = get_spark("opt_build_time")
    spark.range(10).selectExpr("sum(id)").collect()  # JVM warmup
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        try:
            fn(spark, SF_DIR)  # warm: schema memo, first-touch resolution
        except Exception as exc:  # noqa: BLE001
            out[name] = float("nan")
            print(f"[err] {name}: {exc}", file=sys.stderr)
            continue
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    ranked = dict(
        sorted(out.items(), key=lambda kv: -(kv[1] if kv[1] == kv[1] else 0))
    )
    print(json.dumps({"build_sec": ranked, "total": round(sum(v for v in out.values() if v == v), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
