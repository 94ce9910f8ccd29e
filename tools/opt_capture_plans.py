"""Round-16 optimization: capture .explain("formatted") for headline queries.

Usage: python tools/opt_capture_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: every
HEADLINE query, suffix "before"). Planning only — nothing executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_data_service_loader_spark.plans.explain import formatted_plan
from crypto_data_service_loader_spark.session import get_spark
from crypto_data_service_loader_spark.suite import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    if not names:
        from bench import HEADLINE

        names = list(HEADLINE)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("opt_capture_plans")
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
